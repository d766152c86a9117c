import numpy as np
import pytest

from salmon_tpu.utils.dna import (canonical_kmers, decode_seq, encode_seq,
                                  kmers_of, revcomp_codes, revcomp_kmers)


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    codes = encode_seq(s)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3]
    assert decode_seq(codes) == s


def test_revcomp_codes():
    codes = encode_seq("AACGT")
    rc = revcomp_codes(codes)
    assert decode_seq(rc) == "ACGTT"
    # invalid stays invalid
    rc2 = revcomp_codes(encode_seq("AN"))
    assert decode_seq(rc2) == "NT"


def naive_kmer(s: str) -> int:
    v = 0
    for ch in s:
        v = v * 4 + "ACGT".index(ch)
    return v


@pytest.mark.parametrize("k", [5, 15, 21, 31])
def test_kmers_of_matches_naive(k):
    rng = np.random.default_rng(k)
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, 80))
    km, valid = kmers_of(encode_seq(s), k)
    assert valid.all()
    for p in range(len(s) - k + 1):
        assert int(km[p]) == naive_kmer(s[p:p + k]), p


def test_kmers_invalid_mask():
    s = "ACGTNACGTACGT"
    k = 5
    km, valid = kmers_of(encode_seq(s), k)
    # any window covering index 4 (the N) is invalid
    for p in range(len(s) - k + 1):
        expected = not (p <= 4 <= p + k - 1)
        assert valid[p] == expected


def rc_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


@pytest.mark.parametrize("k", [5, 16, 31])
def test_revcomp_kmers(k):
    rng = np.random.default_rng(100 + k)
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, 64))
    km, _ = kmers_of(encode_seq(s), k)
    rc = revcomp_kmers(km, k)
    for p in range(len(s) - k + 1):
        assert int(rc[p]) == naive_kmer(rc_str(s[p:p + k])), p


def test_canonical_consistency():
    k = 11
    rng = np.random.default_rng(7)
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    km_f, _ = kmers_of(encode_seq(s), k)
    km_r, _ = kmers_of(revcomp_codes(encode_seq(s)), k)
    canon_f, _ = canonical_kmers(km_f, k)
    canon_r, _ = canonical_kmers(km_r, k)
    # canonical k-mer multiset is strand invariant
    assert sorted(canon_f.tolist()) == sorted(canon_r.tolist())
