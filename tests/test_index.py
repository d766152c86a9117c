import os

import numpy as np
import pytest

from salmon_tpu.index.builder import build_index, load_index, save_index
from salmon_tpu.index.hashtable import build_hash_table, lookup_host
from salmon_tpu.utils.dna import canonical_kmers, encode_seq, kmers_of
from tests.conftest import SAMPLE_TRANSCRIPTS


def _covered_payloads(tab, start, count, n):
    """Per-key hit count of its OWN payload inside the returned range,
    expanding the shadow-merge appendix (payload space = arange(n) when
    the table was built without occ_offsets; separator rows carry -1)."""
    from salmon_tpu.index.hashtable import appendix_plan
    is_sep, src_idx, _ = appendix_plan(tab)
    ext = np.concatenate([np.arange(n, dtype=np.int64),
                          np.where(is_sep, -1, src_idx)])
    cnt = np.maximum(count, 0)
    st = np.where(start >= 0, start, 0).astype(np.int64)
    flat_pos = np.repeat(st, cnt) + (np.arange(int(cnt.sum()))
                                     - np.repeat(np.cumsum(cnt) - cnt,
                                                 cnt))
    flat_id = np.repeat(np.arange(start.shape[0]), cnt)
    ok = ext[flat_pos] == flat_id
    return np.bincount(flat_id[ok], minlength=start.shape[0])


def test_hash_table_roundtrip(rng):
    keys = rng.integers(0, 1 << 62, size=5000).astype(np.uint64)
    keys = np.unique(keys)
    tab = build_hash_table(keys)
    start, count = lookup_host(tab, keys)
    # keys overflowing both candidate buckets are evicted by design
    # (recorded in n_evicted); every retained key must resolve to a
    # range COVERING its payload (shadow-merged slots return a block)
    present = start != -1
    assert int((~present).sum()) <= tab.n_evicted
    assert tab.n_evicted <= max(2, keys.shape[0] // 1000)
    covered = _covered_payloads(tab, start, count, keys.shape[0])
    assert int((covered >= 1).sum()) >= keys.shape[0] - tab.n_evicted
    # absent keys miss (up to ~2.4e-4 junk fingerprint matches)
    absent = rng.integers(0, 1 << 62, size=1000).astype(np.uint64)
    absent = np.setdiff1d(absent, keys)
    start, count = lookup_host(tab, absent)
    assert (start == -1).sum() >= absent.shape[0] - 2


def test_hash_table_probe_bound(rng):
    keys = np.unique(rng.integers(0, 1 << 62, size=200_000).astype(np.uint64))
    tab = build_hash_table(keys)
    assert tab.max_probes <= 64  # bounded probing at load factor 0.5


@pytest.fixture(scope="module")
def small_index(sample_data_dir):
    return build_index(SAMPLE_TRANSCRIPTS, k=31)


def test_index_every_kmer_resolves(small_index):
    """SURVEY.md §7 build-order step 2 gate: every transcript k-mer resolves
    to the correct (txp, pos, orient) set."""
    idx = small_index
    k = idx.k
    tids = [0, 7, 14]
    for tid in tids:
        codes = idx.transcript_codes(tid)
        km, valid = kmers_of(codes, k)
        canon, fwd = canonical_kmers(km, k)
        starts, counts, itxp, ipf = lookup_host(idx.table, canon,
                                                decode_inline=True)
        # -2 marks inlined single-occurrence slots (their record rides
        # in itxp/ipf); everything else must resolve to a CSR range
        assert ((starts[valid] >= 0) | (starts[valid] == -2)).all()
        for p in np.nonzero(valid)[0][::17]:  # sample positions
            if starts[p] == -2:
                assert counts[p] == 1
                assert itxp[p] == tid and (ipf[p] >> 1) == p, (tid, p)
                assert bool(ipf[p] & 1) == fwd[p]
                continue
            lo, hi_ = starts[p], starts[p] + counts[p]
            occ_t = idx.occ_txp[lo:hi_]
            occ_p = idx.occ_pos[lo:hi_]
            occ_f = idx.occ_fwd[lo:hi_]
            hit = (occ_t == tid) & (occ_p == p)
            assert hit.any(), (tid, p)
            assert (occ_f[hit] == fwd[p]).all()


def test_index_save_load_roundtrip(small_index, tmp_path):
    d = str(tmp_path / "idx")
    save_index(small_index, d)
    idx2 = load_index(d)
    assert idx2.k == small_index.k
    assert idx2.names == small_index.names
    np.testing.assert_array_equal(idx2.kmers, small_index.kmers)
    np.testing.assert_array_equal(idx2.occ_txp, small_index.occ_txp)
    np.testing.assert_array_equal(idx2.table.rows,
                                  small_index.table.rows)


def test_index_rejects_even_k(sample_data_dir):
    with pytest.raises(ValueError):
        build_index(SAMPLE_TRANSCRIPTS, k=30)


def test_decoy_partition(tmp_path):
    fa = tmp_path / "t.fa"
    fa.write_text(">t1\nACGTACGTACGTACGTACGT\n>t2\nTTTTGGGGCCCCAAAATTTT\n")
    dec = tmp_path / "d.fa"
    dec.write_text(">chr1\nACGTACGTACGTACGTACGTTTTT\n")
    idx = build_index(str(fa), k=11, decoys_path=str(dec))
    assert idx.num_targets == 3
    assert idx.first_decoy_index == 2
    assert idx.names[-1] == "chr1"


def test_hashtable_two_choice_overflow():
    """At the max load factor (~5 keys per 8-slot bucket) the two-choice
    placement keeps evictions to a few per million, every placed key
    resolves, and evicted keys count is exact."""
    import numpy as np
    rng = np.random.default_rng(0)
    keys = np.unique(rng.integers(0, 2**62, 400000).astype(np.uint64))
    tab = build_hash_table(keys)
    n = keys.shape[0]
    assert tab.n_slots / 2 * 0.62 <= n <= tab.n_slots  # near max load
    assert tab.n_evicted <= n * 1e-4
    start, count = lookup_host(tab, keys)
    found = start >= 0
    assert found.sum() >= n - tab.n_evicted
    # every placed key's range covers its own payload — exactly for
    # most, via a shadow-merged block for fingerprint-collided keys
    covered = _covered_payloads(tab, start, count, n)
    assert int((covered >= 1).sum()) >= n - tab.n_evicted
    assert (found & (start == np.arange(n))).sum() / max(
        found.sum(), 1) > 0.999


def test_hashtable_shadow_merge_preserves_all_keys():
    """A stored key whose probe window contains an earlier slot with the
    same 16-bit fingerprint must still resolve to a range containing its
    own payload (the build merges it into the shadowing slot — the
    pre-fix behavior silently returned only the OTHER key's records).
    At 600k keys the expected number of shadowed keys is ~150, so this
    exercises the merge path for real."""
    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 2**62, 600000).astype(np.uint64))
    n = keys.shape[0]
    tab = build_hash_table(keys)
    assert tab.n_shadowed > 0, "fixture has no fp collisions; enlarge"
    assert tab.appendix.shape[0] >= 2 * tab.n_shadowed  # resident+shadowed
    start, count = lookup_host(tab, keys)
    covered = _covered_payloads(tab, start, count, n)
    assert int((covered >= 1).sum()) >= n - tab.n_evicted
    # shadow-merged lookups return a few foreign records too — bounded
    # by the block sizes (all counts are 1 here)
    assert int(count.sum()) <= n + 8 * tab.n_shadowed

    # the separator records make merged blocks EXACT: applying the seed
    # flow's filter (rows count only when the last separator's
    # fingerprint30 matches the query's) must recover precisely the
    # key's own payload for every merged key
    from salmon_tpu.index.hashtable import (appendix_plan, fingerprint30,
                                            split_u64)
    is_sep, src_idx, sep_fp = appendix_plan(tab)
    ext_payload = np.concatenate([np.arange(n, dtype=np.int64),
                                  np.where(is_sep, -1, src_idx)])
    ext_sep = np.concatenate([np.zeros(n, bool), is_sep])
    ext_fp = np.concatenate([np.zeros(n, np.int64), sep_fp])
    hi, lo = split_u64(keys)
    q30 = fingerprint30(hi, lo).astype(np.int64)
    merged = np.nonzero((start >= 0) & (count > 1))[0]
    assert merged.size >= tab.n_shadowed
    for i in merged:
        rows = np.arange(start[i], start[i] + count[i])
        last_fp, seen, got = 0, False, []
        for r in rows:
            if ext_sep[r]:
                last_fp, seen = ext_fp[r], True
            elif not seen or last_fp == q30[i]:
                got.append(ext_payload[r])
        assert got == [i], (i, got)


def test_hashtable_eviction_prefers_repetitive_keys():
    """Bucket overflow evicts the highest-occurrence keys first (the
    repetitive seeds the reference's maxOccsPerHit would skip anyway)."""
    import numpy as np
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(0, 2**62, 120000).astype(np.uint64))
    n = keys.shape[0]
    # make ~1% of keys extremely repetitive; shrink the table hard by
    # duplicating load via occ_offsets with huge counts on those keys
    counts = np.ones(n, np.int64)
    hot = rng.choice(n, n // 100, replace=False)
    counts[hot] = 5000
    offsets = np.zeros(n + 1, np.int64)
    offsets[1:] = np.cumsum(counts)
    tab = build_hash_table(keys, occ_offsets=offsets,
                           load_factor=0.9, max_load_factor=0.95)
    if tab.n_evicted == 0:
        return  # nothing to check at this fill
    start, _ = lookup_host(tab, keys)
    evicted = start < 0
    # evicted keys skew heavily toward the repetitive ones
    assert counts[evicted].mean() > counts.mean()


def test_hashtable_count_saturation():
    """Occurrence counts saturate at 16 bits without corrupting starts."""
    import numpy as np
    keys = np.array([123456789, 987654321], dtype=np.uint64)
    offsets = np.array([0, 100000, 100002], dtype=np.int64)
    tab = build_hash_table(keys, occ_offsets=offsets)
    start, count = lookup_host(tab, keys)
    assert start[0] == 0 and count[0] == 0xFFFF  # saturated
    assert start[1] == 100000 and count[1] == 2


def test_partitioned_build_matches_flat(sample_data_dir):
    """The memory-bounded partitioned build (genome-decoy-scale path)
    must produce a bit-identical index to the flat path."""
    from salmon_tpu.index import native_kmers
    if not native_kmers.available():
        pytest.skip("native library unavailable")
    flat = build_index(SAMPLE_TRANSCRIPTS, k=25)
    part = build_index(SAMPLE_TRANSCRIPTS, k=25, partition_bits=3)
    np.testing.assert_array_equal(part.kmers, flat.kmers)
    np.testing.assert_array_equal(part.occ_offsets, flat.occ_offsets)
    np.testing.assert_array_equal(part.occ_txp, flat.occ_txp)
    np.testing.assert_array_equal(part.occ_pos, flat.occ_pos)
    np.testing.assert_array_equal(part.occ_fwd, flat.occ_fwd)
    np.testing.assert_array_equal(part.table.rows, flat.table.rows)


def test_tableless_index_requires_shards(tmp_path, monkeypatch,
                                         sample_data_dir):
    """Past TABLE_DIRECT_MAX_KEYS the build skips the monolithic table;
    such an index round-trips through save/load and quantifies via
    --indexShards, while the plain path errors with guidance."""
    from salmon_tpu.index import builder as B
    from salmon_tpu.index import native_kmers
    if not native_kmers.available():
        pytest.skip("native library unavailable")
    monkeypatch.setattr(B, "TABLE_DIRECT_MAX_KEYS", 10)
    idx = B.build_index(SAMPLE_TRANSCRIPTS, k=25, partition_bits=2)
    assert idx.table is None
    assert idx.info.get("requires_shards") is True
    d = str(tmp_path / "big_idx")
    save_index(idx, d)
    idx2 = load_index(d)
    assert idx2.table is None

    from salmon_tpu.mapping.pipeline import MapperConfig
    with pytest.raises(ValueError, match="indexShards"):
        MapperConfig.from_index(idx2)

    from salmon_tpu.constants import SalmonDefaults
    from salmon_tpu.quant import quantify
    o = SalmonDefaults()
    o.index_shards = 4
    o.reads_per_batch = 4096
    r1 = [os.path.join(sample_data_dir, "reads_1.fastq")]
    r2 = [os.path.join(sample_data_dir, "reads_2.fastq")]
    res = quantify(idx2, "IU", r1, r2, opts=o, progress=False)
    assert res.num_mapped == 10000


def test_native_kmer_enumeration_matches_numpy(rng):
    """The native OpenMP enumerate+radix-sort path (native/kmersort.cpp)
    must reproduce the pure-numpy enumeration bit-for-bit, including
    N-handling and stable (txp, pos) order within each k-mer."""
    from salmon_tpu.index import native_kmers

    if not native_kmers.available():
        pytest.skip("native library unavailable")
    k = 25
    seqs = []
    for n in (10, 100, 31, 24, 400):   # incl. too-short (< k)
        s = rng.integers(0, 4, n).astype(np.uint8)
        # sprinkle invalid codes (N) into the longer sequences
        if n >= 100:
            s[rng.integers(0, n, 3)] = 4
        seqs.append(s)
    offsets = np.zeros(len(seqs) + 1, np.int64)
    offsets[1:] = np.cumsum([len(s) for s in seqs])
    seq_codes = np.concatenate(seqs)

    km_n, tx_n, po_n, fw_n = native_kmers.enumerate_sorted(
        seq_codes, offsets, k)

    all_kmers, all_txp, all_pos, all_fwd = [], [], [], []
    for tid, s in enumerate(seqs):
        kms, valid_mask = kmers_of(s, k)
        if kms.shape[0] == 0:
            continue
        canon, fwd = canonical_kmers(kms, k)
        all_kmers.append(canon[valid_mask])
        all_fwd.append(fwd[valid_mask])
        pos = np.nonzero(valid_mask)[0].astype(np.int32)
        all_txp.append(np.full(pos.shape[0], tid, dtype=np.int32))
        all_pos.append(pos)
    km = np.concatenate(all_kmers)
    tx = np.concatenate(all_txp)
    po = np.concatenate(all_pos)
    fw = np.concatenate(all_fwd)
    order = np.argsort(km, kind="stable")

    np.testing.assert_array_equal(km_n, km[order])
    np.testing.assert_array_equal(tx_n, tx[order])
    np.testing.assert_array_equal(po_n, po[order])
    np.testing.assert_array_equal(fw_n, fw[order])


def test_inline_singles_device_lookup(small_index):
    """Inlined single-occurrence slots decode identically on host and
    device, and the table actually inlines the singleton majority."""
    import jax.numpy as jnp

    from salmon_tpu.mapping.lookup import hash_lookup

    idx = small_index
    assert idx.table.n_inlined > 0
    singles = np.nonzero(idx.occ_counts == 1)[0]
    pick = singles[::max(1, singles.shape[0] // 200)]
    keys = idx.kmers[pick]
    hs, hc, ht, hp = lookup_host(idx.table, keys, decode_inline=True)
    from salmon_tpu.index.hashtable import split_u64
    hi, lo = split_u64(keys)
    ds, dc, df, dinl, dt, dp_ = hash_lookup(
        jnp.asarray(hi.view(np.uint32)), jnp.asarray(lo.view(np.uint32)),
        jnp.asarray(idx.table.rows),
        idx.table.n_slots, idx.table.max_probes)
    np.testing.assert_array_equal(np.asarray(ds), hs)
    np.testing.assert_array_equal(np.asarray(dc), hc)
    assert np.asarray(df).all()
    inl = hs == -2
    # the sample's singleton keys overwhelmingly inline (only shadowed
    # keys and fpcnt-zero guards stay pointer slots)
    assert inl.mean() > 0.9
    np.testing.assert_array_equal(np.asarray(dt)[inl], ht[inl])
    np.testing.assert_array_equal(np.asarray(dp_)[inl], hp[inl])
    # records match the CSR truth
    g0 = idx.occ_offsets[:-1][pick[inl]]
    np.testing.assert_array_equal(ht[inl], idx.occ_txp[g0])
    np.testing.assert_array_equal(hp[inl], np.asarray(idx.occ_pf)[g0])


def test_native_placement_parity():
    """native/kmersort.cpp table_place must reproduce the numpy
    two-choice placement bit-for-bit (rows, evictions) — the sharded
    load path depends on it (VERDICT r4 next #2)."""
    from salmon_tpu.index import native_kmers
    if not native_kmers.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for n, load in ((5000, 0.5), (40000, 0.95)):
        keys = np.unique(rng.integers(0, 2**62, n * 2).astype(np.uint64))
        keys = keys[:n]
        counts = rng.geometric(0.2, keys.shape[0]).astype(np.int64)
        off = np.zeros(keys.shape[0] + 1, np.int64)
        np.cumsum(counts, out=off[1:])
        from salmon_tpu.index.hashtable import table_n_slots
        n_slots = table_n_slots(keys.shape[0], max_load_factor=load)
        tab_nat = build_hash_table(keys, occ_offsets=off, n_slots=n_slots)
        orig = native_kmers.table_place_native
        native_kmers.table_place_native = lambda *a, **k: None
        try:
            tab_py = build_hash_table(keys, occ_offsets=off,
                                      n_slots=n_slots)
        finally:
            native_kmers.table_place_native = orig
        np.testing.assert_array_equal(tab_nat.rows, tab_py.rows)
        assert tab_nat.n_evicted == tab_py.n_evicted
        assert tab_nat.n_shadowed == tab_py.n_shadowed
        np.testing.assert_array_equal(tab_nat.appendix, tab_py.appendix)
