"""v5 compact disk format: codec roundtrips, save/load equality,
--maxOccsKept query parity (index.diskfmt; VERDICT r3 next #4)."""

import os

import numpy as np
import pytest

from salmon_tpu.index import diskfmt
from salmon_tpu.index.builder import build_index, load_index, save_index


def test_pack_keys_roundtrip_delta():
    rng = np.random.default_rng(0)
    # dense keys -> small deltas -> delta32 mode
    keys = np.sort(rng.choice(2**40, 50000, replace=False).astype(
        np.uint64))
    z = diskfmt.pack_keys(keys)
    assert z["mode"] == "delta32"
    np.testing.assert_array_equal(diskfmt.unpack_keys(z), keys)


def test_pack_keys_escapes():
    # a few giant gaps force escapes but not raw fallback
    keys = np.cumsum(np.concatenate(
        [[5], np.full(1000, 17, np.uint64),
         [np.uint64(2**45)], np.full(1000, 3, np.uint64)]
    ).astype(np.uint64)).astype(np.uint64)
    z = diskfmt.pack_keys(keys)
    assert z["mode"] == "delta32" and z["kmer_esc_idx"].shape[0] >= 1
    np.testing.assert_array_equal(diskfmt.unpack_keys(z), keys)


def test_pack_keys_raw_fallback():
    rng = np.random.default_rng(1)
    # sparse keys over the full u64 space -> most deltas >= 2^32 -> raw
    keys = np.sort(rng.integers(0, 2**63, 2000).astype(np.uint64))
    z = diskfmt.pack_keys(keys)
    assert z["mode"] == "raw"
    np.testing.assert_array_equal(diskfmt.unpack_keys(z), keys)


def test_pack_counts_roundtrip():
    rng = np.random.default_rng(2)
    counts = rng.geometric(0.3, 10000).astype(np.int64)
    counts[::997] = 300 + rng.integers(0, 1000, counts[::997].shape[0])
    off = np.zeros(counts.shape[0] + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    z = diskfmt.pack_counts(off)
    assert z["occ_cnt8"].dtype == np.uint8
    np.testing.assert_array_equal(diskfmt.unpack_counts(z), off)


def test_pack_seq2_roundtrip():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 10007).astype(np.uint8)
    codes[rng.choice(10007, 23, replace=False)] = 4   # Ns
    z = diskfmt.pack_seq2(codes)
    assert z["seq2"].shape[0] == -(-10007 // 4)
    np.testing.assert_array_equal(diskfmt.unpack_seq2(z), codes)


def test_prune_occurrences():
    off = np.array([0, 3, 3, 10, 12], np.int64)
    a = np.arange(12, dtype=np.int32)
    new_off, (pa,), tc = diskfmt.prune_occurrences(off, (a,), 4)
    np.testing.assert_array_equal(new_off, [0, 3, 3, 7, 9])
    np.testing.assert_array_equal(pa, [0, 1, 2, 3, 4, 5, 6, 10, 11])
    np.testing.assert_array_equal(tc, [3, 0, 7, 2])


def test_prune_occurrences_multichunk():
    # regression (r4 advisor): chunks after the first read sources off
    # by -new_base. Tiny chunk_keys forces many chunks; compare against
    # the single-chunk (trivially correct) result.
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 9, 257).astype(np.int64)
    off = np.zeros(counts.shape[0] + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    a = np.arange(off[-1], dtype=np.int32)
    b = (a * 3 + 1).astype(np.int32)
    ref_off, (ra, rb), ref_tc = diskfmt.prune_occurrences(
        off.copy(), (a.copy(), b.copy()), 4, chunk_keys=1 << 30)
    for ck in (1, 2, 5, 64):
        got_off, (ga, gb), got_tc = diskfmt.prune_occurrences(
            off.copy(), (a.copy(), b.copy()), 4, chunk_keys=ck)
        np.testing.assert_array_equal(got_off, ref_off)
        np.testing.assert_array_equal(ga, ra)
        np.testing.assert_array_equal(gb, rb)
        np.testing.assert_array_equal(got_tc, ref_tc)


@pytest.fixture(scope="module")
def sample_fa(sample_data_dir):
    return os.path.join(sample_data_dir, "transcripts.fasta")


def test_save_load_v5_roundtrip(tmp_path, sample_fa):
    idx = build_index(sample_fa, k=25)
    d = str(tmp_path / "v5idx")
    save_index(idx, d)
    got = load_index(d)
    assert got.info["index_format_version"] == 5
    np.testing.assert_array_equal(got.kmers, idx.kmers)
    np.testing.assert_array_equal(got.occ_offsets, idx.occ_offsets)
    np.testing.assert_array_equal(got.occ_txp, idx.occ_txp)
    np.testing.assert_array_equal(got.occ_pf, idx.occ_pf)
    np.testing.assert_array_equal(got.seq_codes, idx.seq_codes)
    np.testing.assert_array_equal(got.table.rows, idx.table.rows)
    assert got.table.n_slots == idx.table.n_slots
    # derived planes agree too
    np.testing.assert_array_equal(got.occ_pos, idx.occ_pf >> 1)
    np.testing.assert_array_equal(got.occ_fwd, (idx.occ_pf & 1) == 1)


def test_v5_smaller_than_v4_layout(tmp_path, sample_fa):
    """The compact encoding beats the raw planes it replaced (offsets
    8B -> ~1B/key, pos+fwd 5B -> 4B/rec, seq 1B -> 0.25B/base)."""
    idx = build_index(sample_fa, k=25)
    d = str(tmp_path / "v5size")
    save_index(idx, d)
    sz = {f: os.path.getsize(os.path.join(d, f))
          for f in os.listdir(d) if f.endswith(".npy")}
    n_keys = idx.kmers.shape[0]
    assert sz["occ_cnt8.npy"] < 0.2 * (8 * (n_keys + 1))
    assert sz["seq2.npy"] < 0.3 * idx.seq_codes.shape[0]


def test_max_occs_kept_query_parity(tmp_path, sample_fa):
    """Pruned index quantifies identically when occ_cap <= maxOccsKept
    (the stored prefix covers every gatherable record and the table
    keeps true counts for the repetitive filter)."""
    from salmon_tpu.constants import SalmonDefaults
    from salmon_tpu.quant import quantify

    r1 = [os.path.join(os.path.dirname(sample_fa), "reads_1.fastq")]
    r2 = [os.path.join(os.path.dirname(sample_fa), "reads_2.fastq")]
    o = SalmonDefaults()
    o.reads_per_batch = 4096
    # sample max multiplicity is 6 — kept=4 actually prunes; parity
    # requires occ_cap <= kept on BOTH runs
    kept = 4
    o.occ_cap = kept

    full = build_index(sample_fa, k=25)
    pruned = build_index(sample_fa, k=25, max_occs_kept=kept)
    assert int(pruned.occ_counts.max()) <= kept
    # true counts preserved for the filter
    assert pruned.occ_true_counts is not None
    np.testing.assert_array_equal(pruned.occ_true_counts,
                                  full.occ_counts)

    a = quantify(full, "IU", r1, r2, opts=o, progress=False)
    b = quantify(pruned, "IU", r1, r2, opts=o, progress=False)
    assert a.num_mapped == b.num_mapped
    np.testing.assert_allclose(a.counts, b.counts, rtol=1e-6, atol=1e-4)


def test_pruned_save_load(tmp_path, sample_fa):
    idx = build_index(sample_fa, k=25, max_occs_kept=4)
    d = str(tmp_path / "pruned")
    save_index(idx, d)
    got = load_index(d)
    assert got.occ_true_counts is not None
    np.testing.assert_array_equal(got.occ_true_counts,
                                  idx.occ_true_counts)
    np.testing.assert_array_equal(got.occ_offsets, idx.occ_offsets)


def test_pack_keys_ef_roundtrip():
    rng = np.random.default_rng(9)
    for n, hi in ((1000, 2**40), (50000, 2**62), (8191, 2**20)):
        keys = np.sort(rng.choice(hi, n, replace=False)
                       .astype(np.uint64))
        z = diskfmt.pack_keys_ef(keys)
        np.testing.assert_array_equal(diskfmt.unpack_keys_ef(z), keys)
        chunks = [k for _, k in diskfmt.iter_keys_ef(z, chunk=1024)]
        np.testing.assert_array_equal(np.concatenate(chunks), keys)


def test_save_load_ef_mode(tmp_path, sample_fa):
    """Force the EF key plane through a full save/load/stream cycle."""
    from salmon_tpu.index import diskfmt as dfm
    from salmon_tpu.index.shard import _stream_keys
    idx = build_index(sample_fa, k=25)
    d = str(tmp_path / "ef_idx")
    os.makedirs(d, exist_ok=True)
    # dense synthetic keys (EF-favorable) substituted for the real
    # plane to exercise the ef writer path end-to-end
    rng = np.random.default_rng(3)
    keys = np.sort(rng.choice(2**22, idx.kmers.shape[0],
                              replace=False).astype(np.uint64))
    mode, extra = dfm.write_keys_npy(d, keys)
    assert mode == "ef"
    z = {"ef_low": np.load(os.path.join(d, "kmer_ef_low.npy"),
                           mmap_mode="r"),
         "ef_high": np.load(os.path.join(d, "kmer_ef_high.npy"),
                            mmap_mode="r"),
         "ef_l": extra["kmer_ef_l"], "ef_n": extra["kmer_ef_n"]}
    np.testing.assert_array_equal(
        dfm.unpack_keys({"mode": "ef", **z}), keys)
    # streamed reader (sharded load path)
    meta = {"kmer_mode": "ef", **extra}
    got = np.concatenate([k for _, k in _stream_keys(d, meta)])
    np.testing.assert_array_equal(got, keys)
