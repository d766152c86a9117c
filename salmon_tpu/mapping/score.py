"""Hit collection and per-(transcript, orientation) scoring on device.

This is the TPU re-expression of pufferfish's MemCollector/MemChainer hit
projection + chaining (consumed at src/quant/SalmonQuantify.cpp:1266-1288):
instead of per-read hash-map accumulation, every (window, occurrence) hit in
the batch is materialized into a fixed (R, P*C) tensor, sorted per-read by
(candidate key, read position) with a single multi-operand lax.sort, and
reduced to run-length scores with segmented scans. Score = number of
distinct k-mer positions supporting a (transcript, orientation) candidate —
the coverage-style chain score the reference uses when DP validation is off
(tryAlign=false path, SalmonMappingUtils.hpp:359-361).

Raggedness policy (SURVEY.md §7 hard part #1): occurrences per k-mer are
capped at C (config.occ_cap); k-mers with more than `max_occs_per_hit`
occurrences are skipped entirely, mirroring the reference's repetitive-seed
filters (maxOccsPerHit, SalmonDefaults.hpp:64-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from salmon_tpu.mapping.lookup import fingerprint30

INVALID_KEY = jnp.uint32(0xFFFFFFFF)


def gather_occ_oct(occ_oct, start, C: int):
    """Fetch C consecutive occurrence records starting at flat index
    `start` from the oct-packed occurrence matrix.

    `occ_oct` is (n_oct, 16) int32 — each row holds EIGHT
    (txp, pos<<1|fwd) records. Row-gather cost on this backend is per
    ROW (wider rows amortize), so fetching ceil((C+7)/8) oct rows
    instead of C 2-wide rows cuts the occurrence fetch up to ~16x. The
    start offset within the first row is realigned with an 8-way
    static-slice select (elementwise, ~free).

    The oct layout is fixed HOST-side (device_index_arrays): reshaping
    a multi-GB device table between widths makes XLA materialize a
    relayout copy in its default (8, 128) tiling — a 16x HBM blowup
    that OOMs at human scale.

    Args:
      occ_oct: (n_oct, 16) int32 oct-packed occurrence matrix.
      start: (...,) int32 flat occurrence index. May be negative for
        not-found queries: the row index clips in-bounds and the
        garbage records must be masked by the caller.
      C: static number of records to fetch.

    Returns (..., C, 2) int32 records.
    """
    nrows = (C + 14) // 8                    # ceil((C + 7) / 8)
    q0 = start >> 3
    off = (start & 7).astype(jnp.int32)
    ridx = q0[..., None] + jnp.arange(nrows, dtype=jnp.int32)
    rows = jnp.take(occ_oct, jnp.clip(ridx, 0, None), axis=0,
                    mode="clip")             # (..., nrows, 16)
    occ_all = rows.reshape(rows.shape[:-2] + (nrows * 8, 2))
    offb = off[..., None, None]
    out = occ_all[..., 0:C, :]
    for o in range(1, 8):
        out = jnp.where(offb == o, occ_all[..., o:o + C, :], out)
    return out


def expand_occurrences(km: dict, lk, occ_oct,
                       occ_cap: int, max_occs_per_hit: int,
                       stride: int = 1, tail_frac: int = 8,
                       inline_pool: bool = False,
                       row_pool: int = 0):
    """Gather up to C occurrences per found k-mer window.

    `lk` is hash_lookup's (start, count, found, inl, itxp, ipf);
    `occ_oct` is the oct-packed (n_oct, 16) int32 occurrence matrix
    (8 records of txp, pos<<1|fwd per row — see gather_occ_oct).
    `stride` is the base-position step between successive windows (the
    seed-skip analog of the reference's altSkip/mismatchSeedSkip,
    SalmonDefaults.hpp:37): window p sits at read position p*stride.

    BUDGETED TAIL GATHER: random row fetches into a human-scale occ
    matrix cost ~14-23 ns per ISSUED INDEX (pure HBM latency; locality
    and duplicate indices do not help — measured), and 82% of
    query-weighted windows have a single occurrence (92% of stored
    k-mers) — so fetching every record's row for every window wastes
    most of the expand stage on rows whose records are masked anyway.
    ONE oct row is fetched per window, covering the first 8 - (start&7)
    records, and the minority of windows whose records spill past it
    (count + offset > 8) are batch-globally compacted into
    K = max(1024, F // tail_frac) slots that fetch the remaining
    ceil((C - 1) / 8) consecutive oct rows. Windows past the K budget
    degrade gracefully (first-row records only) and are counted in the
    returned `n_tail_over`.

    INLINE POOL (inline_pool=True, for tables built with inlined
    single-occurrence slots — index.hashtable): ~80% of found windows
    carry their record in the lookup itself, so the row0 gather issues
    only K0 = max(4096, F // 3) indices for the windows that actually
    need the CSR. The pool avoids scatters (measured 10+ ms at these
    shapes) by sorting needy-first, gathering the prefix, and
    UN-sorting with one more multi-operand lax.sort (~1 ns/elem).
    Pool overflow degrades to no-records for the excess windows and is
    counted in n_tail_over.

    Returns (key, rpos, diag, valid, n_tail_over); the first four are
    (R, N = P*C) — lane n = window (n // C), record (n % C):
      key  = txp*2 + orient (uint32; orient=1 read maps forward),
      rpos = read window position (in bases),
      diag = tpos - rpos (fw) or tpos + rpos (rc) — strand-specific
             diagonal whose run-minimum recovers the mapped read start.
    """
    start, count, found, inl, itxp, ipf = lk
    R, P = start.shape
    C = occ_cap
    F = R * P
    N = P * C
    usable = found & km["valid"] & (count <= max_occs_per_hit)

    q0 = (start >> 3).reshape(F)
    off = (start.reshape(F) & 7).astype(jnp.int32)
    cnt_c = jnp.minimum(count.reshape(F), C)
    use_f = usable.reshape(F)
    inl_f = (inl.reshape(F)) & use_f
    idx_bits = max(1, (F - 1).bit_length())
    n_pool_over = jnp.int32(0)

    if row_pool and not inline_pool:
        # PER-ROW pool (r5): with inline singles, only ~20-25% of
        # windows actually need the CSR row — but a batch-GLOBAL
        # compaction pays a 17-operand un-sort over F that eats the
        # saved gathers (the r4 inline_pool wash). Per-READ-ROW
        # compaction uses narrow (R, P) sorts instead (~an order of
        # magnitude cheaper than global 1-D sorts of the same area)
        # and gathers only R*row_pool rows. Reads with more than
        # `row_pool` needy windows degrade (leftmost windows win,
        # counted in n_tail_over) — same budget semantics as the tail
        # pool.
        Pneed = min(row_pool, P)
        need2 = (use_f & ~inl_f).reshape(R, P)
        col = jnp.broadcast_to(
            jnp.arange(P, dtype=jnp.uint32)[None, :], (R, P))
        packed0 = (jnp.where(need2, jnp.uint32(0), jnp.uint32(1))
                   << jnp.uint32(12)) | col
        perm = (jax.lax.sort(packed0, dimension=1, is_stable=False)
                & jnp.uint32(0xFFF)).astype(jnp.int32)
        psel = perm[:, :Pneed]                       # (R, Pneed)
        qsel = jnp.take_along_axis(q0.reshape(R, P), psel, axis=1)
        rows_k = jnp.take(occ_oct,
                          jnp.clip(qsel.reshape(-1), 0, None),
                          axis=0, mode="clip")       # (R*Pneed, 16)
        # un-sort within each row: sort by the FULL per-row permutation
        # (perm is a permutation of 0..P-1, so sorting (perm, payload)
        # sends pool position p back to window column perm[p]; keying
        # only the selected columns would compact rows to ranks
        # 0..Pneed-1 instead — r5 review finding)
        rows_p = jnp.concatenate(
            [rows_k.reshape(R, Pneed, 16),
             jnp.zeros((R, P - Pneed, 16), jnp.int32)], axis=1)
        ops = (perm,) + tuple(rows_p[:, :, i] for i in range(16))
        srt = jax.lax.sort(ops, dimension=1, num_keys=1,
                           is_stable=False)
        row0 = jnp.stack(srt[1:], axis=2).reshape(F, 16)
        incl = jnp.cumsum(need2.astype(jnp.int32), axis=1) <= Pneed
        got_row0 = (need2 & incl).reshape(F)
        n_pool_over = jnp.maximum(
            jnp.sum(need2.astype(jnp.int32)) - jnp.sum(
                (need2 & incl).astype(jnp.int32)), 0)
    elif not inline_pool:
        # row 0: one row-gather per window
        row0 = jnp.take(occ_oct, jnp.clip(q0, 0, None), axis=0,
                        mode="clip")                      # (F, 16)
        got_row0 = use_f
    else:
        need_row = use_f & ~inl_f
        K0 = min(F, max(4096, F // 3))
        packed0 = ((jnp.where(need_row, jnp.uint32(0), jnp.uint32(1))
                    << jnp.uint32(idx_bits))
                   | jnp.arange(F, dtype=jnp.uint32))
        perm = (jax.lax.sort(packed0, dimension=0, is_stable=False)
                & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
        q0p = jnp.take(q0, perm[:K0])
        rows_k = jnp.take(occ_oct, jnp.clip(q0p, 0, None), axis=0,
                          mode="clip")                    # (K0, 16)
        rows_cat = jnp.concatenate(
            [rows_k, jnp.zeros((F - K0, 16), jnp.int32)], axis=0)
        # unsort by destination key: one 17-operand sort, no scatter
        ops = (jax.lax.bitcast_convert_type(perm, jnp.uint32),) + tuple(
            rows_cat[:, i] for i in range(16))
        sorted_back = jax.lax.sort(ops, dimension=0, num_keys=1,
                                   is_stable=False)
        row0 = jnp.stack(sorted_back[1:], axis=1)         # (F, 16)
        got_row0 = need_row & (jnp.cumsum(need_row.astype(jnp.int32))
                               <= K0)
        n_pool_over = jnp.maximum(
            jnp.sum(need_row.astype(jnp.int32)) - jnp.int32(K0), 0)

    # tail pool: the few windows spilling past row 0 (inline windows
    # have count 1 + offset 6 — never needy)
    tail_n = max(1, -(-(C - 1) // 8))        # ceil((C-1)/8) extra rows
    need = use_f & (cnt_c + off > 8)
    K = min(F, max(1024, F // tail_frac))
    packed = ((jnp.where(need, jnp.uint32(0), jnp.uint32(1))
               << jnp.uint32(idx_bits))
              | jnp.arange(F, dtype=jnp.uint32))
    perm_t = (jax.lax.sort(packed, dimension=0, is_stable=False)
              & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    sel = perm_t[:K]
    sel_need = jnp.take(need, sel)
    ridx = (jnp.clip(jnp.take(q0, sel), 0, None)[:, None]
            + jnp.arange(1, tail_n + 1, dtype=jnp.int32))
    tail = jnp.take(occ_oct, jnp.clip(ridx, 0, None), axis=0,
                    mode="clip")                          # (K, tail_n, 16)
    tail = jnp.where(sel_need[:, None, None], tail, 0)
    # distribute tail rows back to window order. Scatter cost on this
    # backend is ~100 ns per updated ROW (probe_pool_parts.py: 98k
    # updates -> 10 ms), while an un-sorting multi-operand lax.sort
    # costs ~1 ns/elem over the FULL F — so small pools (the aligned
    # default: K = F/64 serves only shadow-merged blocks) scatter, and
    # large pools (unaligned indexes) un-sort.
    if K * 100 <= F * (tail_n * 16 + 1):
        tail_buf = jnp.zeros((F, tail_n * 16), jnp.int32).at[sel].set(
            tail.reshape(K, tail_n * 16), mode="drop")
    else:
        cat = jnp.concatenate(
            [tail.reshape(K, tail_n * 16),
             jnp.zeros((F - K, tail_n * 16), jnp.int32)], axis=0)
        ops = (perm_t,) + tuple(cat[:, i] for i in range(tail_n * 16))
        tail_buf = jnp.stack(
            jax.lax.sort(ops, dimension=0, num_keys=1,
                         is_stable=False)[1:], axis=1)
    # the sort keeps the K smallest-index needy windows, so membership
    # is equivalently the first K needy by flat index — a cumsum beats
    # scattering a flag
    got_tail = need & (jnp.cumsum(need.astype(jnp.int32)) <= K)

    # realign by the in-row offset on even/odd LANE views (txp at even
    # lanes, pos<<1|fwd at odd) — strided lane slices + selects, no
    # minor-dim-2 relayout of the full record tensor
    flat = jnp.concatenate([row0, tail_buf], axis=1)    # (F, 16+16*tail_n)
    txp_all = flat[:, 0::2]                             # (F, 8+8*tail_n)
    pf_all = flat[:, 1::2]
    txp_f = txp_all[:, 0:C]
    pf_f = pf_all[:, 0:C]
    for o in range(1, 8):
        m = (off == o)[:, None]
        txp_f = jnp.where(m, txp_all[:, o:o + C], txp_f)
        pf_f = jnp.where(m, pf_all[:, o:o + C], pf_f)

    # inlined single-occurrence slots: the record rode in the lookup
    # row itself — inject it (only lane 0 is valid via cnt_c == 1)
    txp_f = jnp.where(inl_f[:, None], itxp.reshape(F)[:, None], txp_f)
    pf_f = jnp.where(inl_f[:, None], ipf.reshape(F)[:, None], pf_f)

    c_idx = jnp.arange(C, dtype=jnp.int32)
    lane_src = (((c_idx[None, :] < 8 - off[:, None])
                 & got_row0[:, None])
                | got_tail[:, None] | inl_f[:, None])
    ovalid = (use_f[:, None] & (c_idx[None, :] < cnt_c[:, None])
              & lane_src).reshape(R, N)

    # everything below runs on (R, N = P*C) 2-D tensors — a minor
    # dimension of 8 gets lane-padded 16x by the default TPU tiling,
    # which made the epilogue cost ~3 ms/end at human shapes
    txp = txp_f.reshape(R, N)
    tpos = (pf_f >> 1).reshape(R, N)
    tfwd = (pf_f & 1).astype(bool).reshape(R, N)

    # shadow-merged blocks: separator records (txp = -1) open a
    # sub-segment tagged with its key's fingerprint30; rows past a
    # separator count only for the matching query (hashtable
    # docstring). Window boundaries every C lanes reset the carry.
    # Separators exist only for shadow-merged keys (~2.4e-4 of stored
    # keys), so the whole scan is gated behind one any-separator
    # reduction — the common batch pays a reduce + select instead of
    # the carry scan (identical results: with no separator every
    # segment is "window start", seg_ok all-true).
    is_sep = ovalid & (txp == jnp.int32(-1))

    def _sep_scan(_):
        lane0 = jnp.broadcast_to(
            (jnp.arange(N, dtype=jnp.int32) % C == 0)[None, :], (R, N))

        def _combine(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va)

        # carried = (last reset lane was a separator?, its tpos) —
        # resets at window starts clear `seen` because lane0 forces
        # fb=True with vb = (False-sep marker, 0)
        seen, carried = jax.lax.associative_scan(
            _combine,
            (is_sep | lane0,
             jnp.where(is_sep, tpos + 1, 0)),  # +1: 0 = "window start"
            axis=1)
        qfp30 = fingerprint30(km["hi"], km["lo"]).astype(jnp.int32)
        qfp30_l = jnp.repeat(qfp30.reshape(R, P), C, axis=1)
        return jnp.asarray((carried == 0) | (carried == qfp30_l + 1),
                           jnp.bool_)

    # the all-true branch derives from is_sep so both branches carry
    # the same varying-axes type under shard_map
    seg_ok = jax.lax.cond(jnp.any(is_sep), _sep_scan,
                          lambda _: is_sep | True, operand=None)
    ovalid = ovalid & ~is_sep & seg_ok

    orient_fw = jnp.repeat(km["is_fw"].reshape(R, P), C, axis=1) == tfwd
    key = (txp.astype(jnp.uint32) << jnp.uint32(1)) | \
        orient_fw.astype(jnp.uint32)
    key = jnp.where(ovalid, key, INVALID_KEY)
    rpos = jnp.broadcast_to(
        jnp.repeat(jnp.arange(P, dtype=jnp.int32) * stride, C)[None, :],
        (R, N))
    diag = jnp.where(orient_fw, tpos - rpos, tpos + rpos)
    n_tail_over = jnp.maximum(
        jnp.sum(need.astype(jnp.int32)) - jnp.int32(K), 0) + n_pool_over
    return key, rpos, diag, ovalid, n_tail_over


def _segmented_min(values, seg_start, axis=1):
    """Per-run minimum via associative scan with segment resets."""
    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))
    _, out = jax.lax.associative_scan(
        combine, (seg_start, values), axis=axis)
    return out


def segment_carry_first(values, seg_start, axis=1):
    """For each element, the value at the start of its segment.

    One associative scan — replaces the cummax-index + take_along_axis
    formulation, whose data-dependent lane gather fuses into a serialized
    kernel on TPU (measured ~50x slower than this scan)."""
    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)
    _, out = jax.lax.associative_scan(
        combine, (seg_start, values), axis=axis)
    return out


DIAG_OFFSET = 4096  # diag >= -max_read_len, so +4096 keeps buckets >= 0


def diag_bucket_bits_for(max_tpos: int, window_bits: int,
                         min_bits: int = 5) -> int:
    """Smallest diagonal-bucket shift such that
    (max_diag + DIAG_OFFSET) >> bits fits the 32 - window_bits key bits
    above the window field. Diagonals are transcript-LOCAL positions,
    so ordinary transcriptomes stay at the default width while huge
    decoy chromosomes (64Mb+) COARSEN the chain bands instead of
    silently wrapping the packed sort key (which would alias unrelated
    diagonal bands and corrupt chain scores/min_diag)."""
    import numpy as _np
    need = int(_np.ceil(_np.log2(max(max_tpos + DIAG_OFFSET + 1, 2))))
    return max(min_bits, need - (32 - window_bits))


def score_candidates(key, rpos, diag, max_cands: int, stride: int = 1,
                     window_bits: int = 8, diag_bucket_bits: int = 5):
    """Sort hits per read and reduce co-linear runs to top-T candidates.

    Co-linear chaining (the MemChainer::findChains role,
    src/quant/SalmonQuantify.cpp:1276-1288): hits sort by
    (candidate key, diagonal bucket, window), so a candidate's score is
    the number of distinct read positions supporting ONE diagonal band
    (bucket width 2^diag_bucket_bits ~ 2x the DP bandwidth) — scattered
    bag-of-k-mers hits on repetitive transcripts land in different
    buckets and score separately, and min_diag can no longer be
    corrupted by one spurious far-away hit. A true chain can straddle a
    bucket boundary; it then yields two candidates whose scores sum to
    the chain length, and DP validation picks the better anchored one.

    Sort-key packing: key1 = txp*2+orient (one u32);
    key2 = diag_bucket << window_bits | window (one u32; window = rpos /
    stride). Two key operands + the diag payload keep the comparator
    narrow — multi-operand comparators are the hot cost of lax.sort on
    TPU — and rpos rides inside key2 instead of a separate payload.

    Args:
      key/rpos/diag: (R, N) flattened hit tensors (N = P*C).
      max_cands: T — candidates kept per read end.
      stride: window spacing in bases (rpos = window * stride).

    Returns dict of (R, T):
      txp (int32), is_fw (bool), score (int32, #distinct supporting read
      positions on the candidate diagonal band), min_diag (int32),
      valid (bool).
    """
    R, N = key.shape
    window = (rpos // stride).astype(jnp.uint32)
    db = ((diag + DIAG_OFFSET).astype(jnp.uint32)
          >> jnp.uint32(diag_bucket_bits))
    key2 = (db << jnp.uint32(window_bits)) | window
    key2 = jnp.where(key == INVALID_KEY, INVALID_KEY, key2)
    key_s, key2_s, diag_s = jax.lax.sort(
        (key, key2, diag), dimension=1, num_keys=2, is_stable=False)
    bucket_s = key2_s >> jnp.uint32(window_bits)

    valid = key_s != INVALID_KEY
    prev_key = jnp.concatenate(
        [jnp.full((R, 1), INVALID_KEY), key_s[:, :-1]], axis=1)
    prev_key2 = jnp.concatenate(
        [jnp.full((R, 1), INVALID_KEY), key2_s[:, :-1]], axis=1)
    prev_bucket = prev_key2 >> jnp.uint32(window_bits)
    next_key = jnp.concatenate(
        [key_s[:, 1:], jnp.full((R, 1), INVALID_KEY)], axis=1)
    next_bucket = jnp.concatenate(
        [bucket_s[:, 1:], jnp.full((R, 1), INVALID_KEY)], axis=1)

    run_start = valid & ((key_s != prev_key) | (bucket_s != prev_bucket))
    run_end = valid & ((key_s != next_key) | (bucket_s != next_bucket))
    # distinct window within the run: equal windows have equal key2
    uniq = valid & (run_start | (key2_s != prev_key2))

    cum = jnp.cumsum(uniq.astype(jnp.int32), axis=1)
    cum_at_start = segment_carry_first(cum, run_start)
    run_score = cum - cum_at_start + 1  # uniq at run start is always 1

    min_diag = _segmented_min(diag_s, run_start, axis=1)

    # top-T by score WITH payloads: one descending sort + slice (top_k
    # would need take_along_axis gathers for the payloads, which fuse
    # into serialized kernels on TPU)
    end_score = jnp.where(run_end, run_score, 0)
    neg = -end_score
    neg_s, top_key, top_diag = jax.lax.sort(
        (neg, key_s, min_diag), dimension=1, num_keys=1,
        is_stable=False)
    top_score = -neg_s[:, :max_cands]
    top_key = top_key[:, :max_cands]
    top_diag = top_diag[:, :max_cands]
    out_valid = top_score > 0
    return {
        "txp": (top_key >> jnp.uint32(1)).astype(jnp.int32),
        "is_fw": (top_key & jnp.uint32(1)).astype(bool),
        "score": top_score,
        "min_diag": top_diag,
        "valid": out_valid,
    }


def candidate_read_start(cand: dict, read_len, k: int):
    """Inferred read start position on the transcript for each candidate.

    fw: start = min(tpos - rpos); rc: start = min(tpos + rpos) + k - len.
    """
    return jnp.where(
        cand["is_fw"], cand["min_diag"],
        cand["min_diag"] + k - read_len[:, None])
