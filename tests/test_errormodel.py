"""Alignment error model: CIGAR expansion and likelihood sanity."""

import numpy as np
import pytest

from salmon_tpu.alignment import bamio
from salmon_tpu.alignment.errormodel import (AlignmentErrorModel,
                                             START_STATE, expand_batch)


def _mini_bam(tmp_path, records, refs):
    path = str(tmp_path / "t.bam")
    bamio.write_bam(path, [r[0] for r in refs], [r[1] for r in refs],
                    records)
    rdr = bamio.BamReader(path)
    b = next(rdr.batches())
    rdr.close()
    return b


def test_expand_perfect_match(tmp_path):
    # ref: ACGTACGTAC (codes 0123012301); read matches positions 2..7
    ref_seq = "ACGTACGTAC"
    codes = np.array([0, 1, 2, 3, 0, 1, 2, 3, 0, 1], dtype=np.uint8)
    b = _mini_bam(tmp_path, [dict(
        name="r1", refid=0, pos=2, flag=0, cigar="6M",
        seq=ref_seq[2:8])], [("t1", 10)])
    cols = expand_batch(
        b, np.array([0]), np.array([0], dtype=np.int64),
        codes, np.array([0, 10], dtype=np.int64),
        np.array([10], dtype=np.int64))
    assert cols["cur"].shape == (6,)
    # perfect match: state = base*9 + base
    want = codes[2:8] * 9 + codes[2:8]
    np.testing.assert_array_equal(cols["cur"], want)
    assert cols["prev"][0] == START_STATE
    np.testing.assert_array_equal(cols["prev"][1:], want[:-1])
    # position bins 0..3 over 6 bases
    assert cols["bin"][0] == 0 and cols["bin"][-1] == 3


def test_expand_insertion_deletion(tmp_path):
    codes = np.array([0, 1, 2, 3, 0, 1, 2, 3, 0, 1], dtype=np.uint8)
    # 2M 1I 2M 1D 1M: read = ref[0:2] + 'T' + ref[2:4] + ref[5:6]
    read = "AC" + "T" + "GT" + "C"
    b = _mini_bam(tmp_path, [dict(
        name="r1", refid=0, pos=0, flag=0, cigar="2M1I2M1D1M",
        seq=read)], [("t1", 10)])
    cols = expand_batch(
        b, np.array([0]), np.array([0], dtype=np.int64),
        codes, np.array([0, 10], dtype=np.int64),
        np.array([10], dtype=np.int64))
    assert cols["cur"].shape == (7,)
    # col 2 is the insertion: ref = DASH (4), read = T (3)
    assert cols["cur"][2] == 4 * 9 + 3
    # col 5 is the deletion: ref base at pos 4 (A=0), read = DASH
    assert cols["cur"][5] == 0 * 9 + 4
    # last col matches ref[5] = C
    assert cols["cur"][6] == 1 * 9 + 1


def test_model_prefers_clean_alignments(tmp_path):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 200).astype(np.uint8)
    seq = "".join("ACGT"[c] for c in codes)
    recs = []
    # 50 perfect alignments
    for i in range(50):
        s = int(rng.integers(0, 150))
        recs.append(dict(name=f"p{i}", refid=0, pos=s, flag=0,
                         cigar="30M", seq=seq[s:s + 30]))
    b = _mini_bam(tmp_path, recs, [("t1", 200)])
    m = AlignmentErrorModel()
    sel = np.arange(b.n)
    cols = expand_batch(b, sel, np.array([0], dtype=np.int64), codes,
                        np.array([0, 200], dtype=np.int64),
                        np.array([200], dtype=np.int64))
    m.update(cols, np.ones(b.n), 0)
    m.normalize()
    ll_clean = m.log_likelihood(cols, b.n, 0)

    # a mismatched alignment scores lower than a clean one
    s = 10
    bad_seq = list(seq[s:s + 30])
    bad_seq[5] = "ACGT"[(codes[s + 5] + 1) % 4]
    b2 = _mini_bam(tmp_path, [dict(name="x", refid=0, pos=s, flag=0,
                                   cigar="30M", seq="".join(bad_seq))],
                   [("t1", 200)])
    cols2 = expand_batch(b2, np.array([0]), np.array([0], dtype=np.int64),
                         codes, np.array([0, 200], dtype=np.int64),
                         np.array([200], dtype=np.int64))
    ll_bad = m.log_likelihood(cols2, 1, 0)
    assert ll_bad[0] < ll_clean.mean() - 1.0


def test_alignment_mode_with_error_model(tmp_path, sample_data_dir):
    """End-to-end -a quant WITH the error model stays accurate."""
    import collections
    import os
    from salmon_tpu.cli import main
    from salmon_tpu.io.writers import read_quant_sf
    from scipy.stats import spearmanr
    from tests.test_alignment_mode import _truth_alignments

    from salmon_tpu.io.fasta import load_transcripts
    records, _ = load_transcripts(
        os.path.join(sample_data_dir, "transcripts.fasta"),
        noclip_polya=True)
    names = [r.name for r in records]
    lens = [r.seq_codes.shape[0] for r in records]
    tid = {nm: i for i, nm in enumerate(names)}
    alns = _truth_alignments(sample_data_dir)
    bam_recs = []
    for name, txp, pos, fend, s1, s2 in alns[:4000]:
        rid = tid[txp]
        L1, L2 = len(s1), len(s2)
        tlen = fend - pos + 1
        p1, p2 = pos, fend - L2 + 1
        bam_recs.append(dict(name=name, refid=rid, pos=p1,
                             flag=0x1 | 0x40 | 0x20, cigar=f"{L1}M",
                             seq=s1, mate_refid=rid, mate_pos=p2,
                             tlen=tlen, tags={"AS": 2 * L1}))
        bam_recs.append(dict(name=name, refid=rid, pos=p2,
                             flag=0x1 | 0x80 | 0x10, cigar=f"{L2}M",
                             seq=s2, mate_refid=rid, mate_pos=p1,
                             tlen=-tlen, tags={"AS": 2 * L2}))
    bam = str(tmp_path / "t.bam")
    bamio.write_bam(bam, names, lens, bam_recs)
    out = str(tmp_path / "q")
    rc = main(["quant", "-t",
               os.path.join(sample_data_dir, "transcripts.fasta"),
               "-l", "IU", "-a", bam, "-o", out, "-q"])
    assert rc == 0
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    truth = collections.Counter(a[1] for a in alns[:4000])
    est = dict(zip(q["Name"], q["NumReads"]))
    t = np.array([truth[k] for k in truth], dtype=float)
    e = np.array([est.get(k, 0.0) for k in truth])
    assert spearmanr(t, e).statistic >= 0.999


def test_ont_model_end_to_end(tmp_path, sample_data_dir):
    """--ont: single-end long-ish reads with NM-based error model."""
    import os
    from salmon_tpu.cli import main
    from salmon_tpu.io.writers import read_quant_sf
    from salmon_tpu.io.fasta import load_transcripts

    rng = np.random.default_rng(5)
    records, _ = load_transcripts(
        os.path.join(sample_data_dir, "transcripts.fasta"),
        noclip_polya=True)
    names = [r.name for r in records]
    lens = [r.seq_codes.shape[0] for r in records]
    recs = []
    counts = {}
    for i in range(2000):
        tid = int(rng.integers(0, len(names)))
        L = int(rng.integers(200, 400))
        s = int(rng.integers(0, max(1, lens[tid] - L)))
        seq = "".join("ACGT"[c] for c in records[tid].seq_codes[s:s + L])
        recs.append(dict(name=f"ont{i}", refid=tid, pos=s, flag=0,
                         cigar=f"{L}M", seq=seq,
                         tags={"NM": int(rng.integers(0, L // 10))}))
        counts[names[tid]] = counts.get(names[tid], 0) + 1
    bam = str(tmp_path / "ont.bam")
    from salmon_tpu.alignment import bamio
    bamio.write_bam(bam, names, lens, recs)
    out = str(tmp_path / "q")
    rc = main(["quant", "-t",
               os.path.join(sample_data_dir, "transcripts.fasta"),
               "-l", "U", "-a", bam, "--ont", "-o", out, "-q"])
    assert rc == 0
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    est = dict(zip(q["Name"], q["NumReads"]))
    # unique alignments: counts recovered exactly
    for nm, c in counts.items():
        assert abs(est[nm] - c) < 1.0, (nm, est[nm], c)
    # --ont forces noLengthCorrection -> effLen = 100 everywhere
    assert np.allclose(q["EffectiveLength"], 100.0)


def test_ont_binomial_clip_model():
    """Reference ONTAlignmentModel semantics: two-tailed binomial error
    likelihood around the bin median; geometric clip tails penalizing
    only clips beyond the bin mean (ONTAlignmentModel.cpp:26-194)."""
    from salmon_tpu.alignment.errormodel import ONTErrorModel

    m = ONTErrorModel()
    rng = np.random.default_rng(0)
    n = 4000
    read_len = np.full(n, 1000)
    nm = rng.binomial(1000, 0.10, n)          # 10% error rate
    fcl = rng.poisson(5.0, n)                 # ~5 front clip bases
    bcl = rng.poisson(20.0, n)
    # model clips as HARD clips so the aligned-length bin stays at
    # read_len (train and eval in the same 100bp bin)
    scl = np.zeros(n, np.int64)
    hcl = fcl + bcl
    m.update(read_len, nm, fcl, bcl, scl, hcl, np.ones(n))

    def ll(nm_v, f=0, bk=0):
        return m.log_likelihood(
            np.array([1000]), np.array([nm_v]), np.array([f]),
            np.array([bk]), np.array([0]), np.array([f + bk]))[0]

    # likelihood peaks at the trained mean error count and decays
    at_mean = ll(100)
    assert at_mean <= 0.0 and at_mean > -1.0
    assert ll(150) < ll(120) < ll(105) <= at_mean + 1e-12
    assert ll(50) < ll(80) < ll(95) <= at_mean + 1e-12
    # symmetric two-tail: same distance from median, similar ll
    assert abs(ll(130) - ll(70)) < 1.5

    # clips below/at the mean are free; beyond the mean penalized
    base = ll(100, f=0, bk=0)
    assert ll(100, f=5, bk=0) >= base - 0.2
    assert ll(100, f=60, bk=0) < base - 2.0
    assert ll(100, f=0, bk=200) < ll(100, f=0, bk=20) - 2.0

    # untrained bin -> neutral error term (no crash, finite)
    out = m.log_likelihood(np.array([49999]), np.array([10]),
                           np.array([0]), np.array([0]), np.array([0]),
                           np.array([0]))
    assert np.isfinite(out[0])


def test_clip_counts_cigar():
    from salmon_tpu.alignment.errormodel import clip_counts

    class B:
        pass

    b = B()
    # record 0: 5S 90M 3S ; record 1: 2H 4S 80M ; record 2: 100M
    b.cigar_op = np.array([4, 0, 4, 5, 4, 0, 0], np.uint8)
    b.cigar_oplen = np.array([5, 90, 3, 2, 4, 80, 100], np.uint32)
    b.cigar_off = np.array([0, 3, 6], np.int64)
    b.cigar_n = np.array([3, 3, 1], np.int32)
    fcl, bcl, scl, hcl = clip_counts(b, np.array([0, 1, 2]))
    assert list(fcl) == [5, 6, 0]
    assert list(bcl) == [3, 0, 0]
    assert list(scl) == [8, 4, 0]
    assert list(hcl) == [0, 2, 0]
