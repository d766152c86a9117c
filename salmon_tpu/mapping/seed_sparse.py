"""Batch-global sparse seed flow: compacted hit list + 1-D global sorts.

The dense seed stage (mapping.score) materializes every (window,
occurrence) slot as an (R, P, C) tensor — at human-scale shapes that is
~6M slots of which <10% are real hits, and the per-read (R, P*C) sorts
and row gathers pay for the padding. This module re-expresses the same
computation (pufferfish MemCollector hit projection + MemChainer
co-linear chaining, consumed at src/quant/SalmonQuantify.cpp:1266-1288)
as a batch-GLOBAL flow sized by the actual hit count:

  1. ragged expansion by scatter+carry: each usable window's occurrence
     range is written once as a packed header row at its exclusive-
     cumsum destination; a segment-carry scan fills every slot of the
     fixed hit budget H = (#ends)*R*B with its governing header, and
     c = slot - dest recovers the occurrence offset;
  2. ONE row gather fetches each hit's (txp, pos<<1|fwd) record;
  3. ONE global 1-D sort by (read-end, candidate key, diagonal-bucket |
     window) groups co-linear runs; flat segmented scans score them
     (distinct supporting windows per diagonal band, as in the dense
     path);
  4. ONE global sort by a packed (read-end << score_bits | ~score) key
     ranks candidates per read end; a row scatter emits the per-end
     top-T candidate dicts consumed by mapping.pair unchanged.

Per-read-end fairness: every end gets the same hit budget B
(`seed_hits_per_end`); within an end, earlier windows win (leftmost
seeds first, like the reference's in-order MEM collection) and each
window is still capped at `occ_cap` occurrences with the
`max_occs_per_hit` repetitive-seed skip.

Sorts and scans here are 1-D over H elements — on this backend sorts
run at ~1ns/element and axis-0 scans are nearly free, while per-row
gathers/scatters cost ~3-8ns/ROW, so shrinking the slot count from
R*P*C to H is the whole game.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from salmon_tpu.mapping.lookup import fingerprint30
from salmon_tpu.mapping.score import (DIAG_OFFSET, INVALID_KEY,
                                      _segmented_min, gather_occ_oct,
                                      segment_carry_first)


def _ceil_log2(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


def seed_candidates_sparse(ends, occ_oct, *, occ_cap: int,
                           max_occs_per_hit: int, hits_per_end: int,
                           max_cands: int, stride: int = 1,
                           diag_bucket_bits: int = 5):
    """Score seed candidates for one or two read ends in one global flow.

    Args:
      ends: list of (km, lookup) per read end, where km is the dict from
        extract_kmers (already strided) and lookup = (start, count,
        found) from hash_lookup; all (R, P).
      occ_oct: (n_oct, 16) oct-packed occurrence matrix (8 records
        of txp, pos<<1|fwd per row — see mapping.score.gather_occ_oct).
      occ_cap: C — occurrences gathered per window.
      max_occs_per_hit: repetitive-seed skip threshold.
      hits_per_end: B — total hit budget per read end.
      max_cands: T — candidates kept per read end.
      stride: window spacing in bases.

    Returns a list of candidate dicts (txp, is_fw, score, min_diag,
    valid), each (R, T), one per end — the same contract as
    mapping.score.score_candidates.
    """
    E = len(ends)
    R, P = ends[0][1][0].shape
    hits = collect_hits_sparse(
        ends, occ_oct, occ_cap=occ_cap,
        max_occs_per_hit=max_occs_per_hit, hits_per_end=hits_per_end,
        stride=stride, diag_bucket_bits=diag_bucket_bits)
    return rank_hits(hits, R=R, E=E, P=P, max_cands=max_cands)


def collect_hits_sparse(ends, occ_oct, *, occ_cap: int,
                        max_occs_per_hit: int, hits_per_end: int,
                        stride: int = 1, diag_bucket_bits: int = 5):
    """Phase 1 of the sparse seed flow: expand each end's found k-mer
    windows into a flat budgeted hit list (steps 1-2 of the module
    docstring). Returns a (rid, key, key2, diag) tuple of (H,) arrays —
    the sort operands `rank_hits` consumes. All values are in GLOBAL
    coordinates (txp ids, transcript positions), so hit lists produced
    against disjoint k-mer shards of one index can be concatenated (the
    sharded-index path all-gathers them across the mesh's kmer axis)
    before ranking; invalid slots carry INVALID_KEY in rid/key/key2.
    """
    E = len(ends)
    R, P = ends[0][1][0].shape
    NE = E * R                       # read-end count
    B = min(hits_per_end, P * occ_cap)
    H = NE * B

    # ---- flat per-window arrays in (read, end, window) order ----------
    def flat(get):
        parts = [get(km, lk) for km, lk in ends]
        if E == 1:
            return parts[0].reshape(-1)
        return jnp.stack(parts, axis=1).reshape(-1)  # (R, E, P) -> flat

    start = flat(lambda km, lk: lk[0])
    count = flat(lambda km, lk: lk[1])
    found = flat(lambda km, lk: lk[2])
    # inlined single-occurrence slots (hash_lookup inl/itxp/ipf):
    # start = -2 marks them, the record rides the header instead of
    # being gathered from the CSR
    itxp = flat(lambda km, lk: lk[4])
    ipf = flat(lambda km, lk: lk[5])
    qfw = flat(lambda km, lk: km["is_fw"])
    kval = flat(lambda km, lk: km["valid"])
    qfp30 = flat(lambda km, lk: fingerprint30(
        km["hi"], km["lo"]).astype(jnp.int32))

    usable = found & kval & (count <= max_occs_per_hit)
    n = jnp.where(usable, jnp.minimum(count, occ_cap), 0)

    # per-end budget: leftmost windows first until B hits are spent
    n2 = n.reshape(NE, P)
    cum_in = jnp.cumsum(n2, axis=1)
    n_used = jnp.clip(B - (cum_in - n2), 0, n2).reshape(-1)

    # ---- ragged expansion: header scatter + carry scan ----------------
    dest = jnp.cumsum(n_used) - n_used                  # exclusive
    dest = dest.astype(jnp.int32)
    W = NE * P
    w_idx = jnp.arange(W, dtype=jnp.int32)
    hdr = jnp.stack(
        [start,
         (w_idx << jnp.int32(1)) | qfw.astype(jnp.int32),
         n_used,
         dest,
         qfp30,
         itxp,
         ipf], axis=1)                                  # (W, 7)
    keep = n_used > 0
    dest_w = jnp.where(keep, dest, H)
    slots = jnp.zeros((H + 1, 7), jnp.int32).at[dest_w].set(
        hdr, mode="drop")[:H]
    flags = jnp.zeros(H + 1, bool).at[dest_w].set(keep, mode="drop")[:H]
    hdrf = segment_carry_first(
        slots, jnp.broadcast_to(flags[:, None], (H, 7)), axis=0)

    c = jnp.arange(H, dtype=jnp.int32) - hdrf[:, 3]
    hit_ok = c < hdrf[:, 2]                             # n=0 before 1st hdr
    occ = gather_occ_oct(occ_oct, hdrf[:, 0] + c, 1)[:, 0, :]
    # ^ (H, 2): one 16-wide oct-row gather per hit + lane select
    is_inl = hdrf[:, 0] == jnp.int32(-2)
    txp = jnp.where(is_inl, hdrf[:, 5], occ[:, 0])
    pf = jnp.where(is_inl, hdrf[:, 6], occ[:, 1])
    tpos = pf >> 1
    tfwd = (pf & 1).astype(bool)

    # ---- shadow-merged blocks: separator records (txp = -1) open a
    # sub-segment tagged with its key's fingerprint30; rows past a
    # separator count only for the query whose fingerprint matches
    # (hashtable docstring) — one carry scan, no extra gathers
    is_sep = txp == jnp.int32(-1)
    seg_set = is_sep | (c == 0)
    seg_vals = jnp.stack(
        [jnp.where(is_sep, tpos, 0),
         is_sep.astype(jnp.int32)], axis=1)             # (H, 2)
    carried = segment_carry_first(
        seg_vals, jnp.broadcast_to(seg_set[:, None], (H, 2)), axis=0)
    seg_ok = (carried[:, 1] == 0) | (carried[:, 0] == hdrf[:, 4])
    hit_ok = hit_ok & ~is_sep & seg_ok

    wcol = hdrf[:, 1]
    q_is_fw = (wcol & 1).astype(bool)
    w = wcol >> 1
    rid = w // P                                        # read-end id
    p = w - rid * P
    rpos = p * stride

    orient_fw = q_is_fw == tfwd
    key = (txp.astype(jnp.uint32) << jnp.uint32(1)) | \
        orient_fw.astype(jnp.uint32)
    key = jnp.where(hit_ok, key, INVALID_KEY)
    diag = jnp.where(orient_fw, tpos - rpos, tpos + rpos)
    rid_u = jnp.where(hit_ok, rid.astype(jnp.uint32), INVALID_KEY)

    window_bits = max(8, _ceil_log2(P))
    if window_bits > 12:
        raise ValueError(
            f"{P} seed windows need window_bits={window_bits} > 12, "
            "which would overflow the diagonal-bucket sort key; raise "
            "kmer_stride or reduce max_read_len")
    db = ((diag + DIAG_OFFSET).astype(jnp.uint32)
          >> jnp.uint32(diag_bucket_bits))
    key2 = (db << jnp.uint32(window_bits)) | p.astype(jnp.uint32)
    key2 = jnp.where(hit_ok, key2, INVALID_KEY)
    return rid_u, key, key2, diag


def rebudget_hits(hits, *, P: int, hits_per_end: int):
    """Re-apply the per-end hit budget over a CONCATENATED hit list.

    The sharded-index path collects up to `hits_per_end` hits per shard
    (a superset of the single-device kept set, since every window's
    occurrences live in exactly one owner shard); keeping the leftmost
    `hits_per_end` of the union — windows first, CSR order within a
    window — restores the single-device budget semantics, so mapping
    results do not depend on --indexShards. One stable global sort by
    (read-end, window): within-window order is already contiguous per
    shard, and stable sorting preserves it.

    Precision note: the per-shard collect budget counts a merged
    window's separator/foreign rows (the slot count includes them),
    while this re-budget ranks only REAL hits — so when the budget is
    BINDING on a read-end whose windows hit shadow-merged slots (both
    rare: ~2.4e-4 of keys merge, and default budgets bind only on
    highly repetitive reads), the kept set can differ from the
    single-device path by the few hits displaced by separators. The
    400-seed parity scan (scripts/repro_shard_parity.py) and the
    default-budget eq-diff on the bundled sample find zero divergence."""
    rid_u, key, key2, diag = hits
    H = rid_u.shape[0]
    window_bits = max(8, _ceil_log2(P))
    p = key2 & jnp.uint32((1 << window_bits) - 1)
    rid_s, _p, key_s, key2_s, diag_s = jax.lax.sort(
        (rid_u, p, key, key2, diag), dimension=0, num_keys=2,
        is_stable=True)
    pos_idx = jnp.arange(H, dtype=jnp.int32)
    seg = rid_s != jnp.concatenate(
        [jnp.full((1,), INVALID_KEY, rid_s.dtype), rid_s[:-1]])
    rank = pos_idx - segment_carry_first(pos_idx, seg, axis=0)
    keep = (rid_s != INVALID_KEY) & (rank < hits_per_end)
    inv_u = jnp.uint32(INVALID_KEY)
    return (jnp.where(keep, rid_s, inv_u), jnp.where(keep, key_s, inv_u),
            jnp.where(keep, key2_s, inv_u), diag_s)


def rank_hits(hits, *, R: int, E: int, P: int, max_cands: int):
    """Phase 2 of the sparse seed flow: co-linear run scoring + per-end
    top-T ranking (steps 3-4 of the module docstring) over a flat hit
    list from `collect_hits_sparse` (possibly the concatenation of
    several shards' lists). Returns the per-end candidate dicts."""
    rid_u, key, key2, diag = hits
    NE = E * R
    H = rid_u.shape[0]
    window_bits = max(8, _ceil_log2(P))

    # ---- global co-linear run scoring ---------------------------------
    rid_s, key_s, key2_s, diag_s = jax.lax.sort(
        (rid_u, key, key2, diag), dimension=0, num_keys=3,
        is_stable=False)
    bucket_s = key2_s >> jnp.uint32(window_bits)
    valid = rid_s != INVALID_KEY

    def prev(a, fill):
        return jnp.concatenate([jnp.full((1,), fill, a.dtype), a[:-1]])

    def nxt(a, fill):
        return jnp.concatenate([a[1:], jnp.full((1,), fill, a.dtype)])

    p_rid = prev(rid_s, INVALID_KEY)
    p_key = prev(key_s, INVALID_KEY)
    p_key2 = prev(key2_s, INVALID_KEY)
    p_bucket = p_key2 >> jnp.uint32(window_bits)
    run_start = valid & ((rid_s != p_rid) | (key_s != p_key)
                         | (bucket_s != p_bucket))
    run_end = valid & ((rid_s != nxt(rid_s, INVALID_KEY))
                       | (key_s != nxt(key_s, INVALID_KEY))
                       | (bucket_s != nxt(bucket_s, INVALID_KEY)))
    uniq = valid & (run_start | (key2_s != p_key2))

    cum = jnp.cumsum(uniq.astype(jnp.int32))
    score = cum - segment_carry_first(cum, run_start, axis=0) + 1
    min_diag = _segmented_min(diag_s, run_start, axis=0)

    # ---- per-read-end top-T ranking -----------------------------------
    sbits = _ceil_log2(P + 2)
    smax = (1 << sbits) - 1
    rbits = _ceil_log2(NE)
    if rbits + sbits > 32:
        raise ValueError("read-end/score packing exceeds 32 bits; "
                         "reduce the batch size")
    rank_key = ((rid_s << jnp.uint32(sbits))
                | jnp.uint32(smax) - jnp.clip(score, 0, smax).astype(
                    jnp.uint32))
    rank_key = jnp.where(run_end, rank_key, INVALID_KEY)
    # all three operands are sort KEYS: score ties must break by
    # (candidate key, diagonal), not by global array position — the
    # global sort mixes reads, so position-dependent tie order would
    # make a read's top-T depend on the rest of the batch (and differ
    # between per-device shard sizes)
    rk_s, keyc, diagc = jax.lax.sort(
        (rank_key, key_s, min_diag), dimension=0, num_keys=3,
        is_stable=False)
    ridc = rk_s >> jnp.uint32(sbits)
    seg = ridc != prev(ridc, INVALID_KEY)
    pos_idx = jnp.arange(H, dtype=jnp.int32)
    rank = pos_idx - segment_carry_first(pos_idx, seg, axis=0)
    T = max_cands
    cand_valid = rk_s != INVALID_KEY
    keepc = cand_valid & (rank < T)
    dest2 = jnp.where(
        keepc, ridc.astype(jnp.int32) * T + rank, NE * T)
    scorec = jnp.int32(smax) - (rk_s & jnp.uint32(smax)).astype(jnp.int32)
    rows = jnp.stack(
        [jax.lax.bitcast_convert_type(keyc, jnp.int32), scorec, diagc],
        axis=1)
    out = jnp.zeros((NE * T + 1, 3), jnp.int32).at[dest2].set(
        rows, mode="drop")[:NE * T]
    out = out.reshape(R, E, T, 3)

    cands = []
    for e in range(E):
        keye = jax.lax.bitcast_convert_type(out[:, e, :, 0], jnp.uint32)
        sc = out[:, e, :, 1]
        cands.append({
            "txp": (keye >> jnp.uint32(1)).astype(jnp.int32),
            "is_fw": (keye & jnp.uint32(1)).astype(bool),
            "score": sc,
            "min_diag": out[:, e, :, 2],
            "valid": sc > 0,
        })
    return cands
