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

INVALID_KEY = jnp.uint32(0xFFFFFFFF)


def expand_occurrences(km: dict, row, found, occ_start, occ_count,
                       occ_txp, occ_pos, occ_fwd, occ_cap: int,
                       max_occs_per_hit: int, stride: int = 1):
    """Gather up to C occurrences per found k-mer window.

    `stride` is the base-position step between successive windows (the
    seed-skip analog of the reference's altSkip/mismatchSeedSkip,
    SalmonDefaults.hpp:37): window p sits at read position p*stride.

    Returns (key, rpos, diag, valid), each (R, P, C):
      key  = txp*2 + orient (uint32; orient=1 read maps forward),
      rpos = read window position (in bases),
      diag = tpos - rpos (fw) or tpos + rpos (rc) — strand-specific
             diagonal whose run-minimum recovers the mapped read start.
    """
    R, P = row.shape
    C = occ_cap
    start = jnp.take(occ_start, row, mode="clip")
    count = jnp.take(occ_count, row, mode="clip")
    usable = found & km["valid"] & (count <= max_occs_per_hit)

    c_idx = jnp.arange(C, dtype=jnp.int32)
    oidx = start[:, :, None] + c_idx[None, None, :]
    ovalid = usable[:, :, None] & (c_idx[None, None, :] < count[:, :, None])

    txp = jnp.take(occ_txp, oidx, mode="clip")
    tpos = jnp.take(occ_pos, oidx, mode="clip")
    tfwd = jnp.take(occ_fwd, oidx, mode="clip").astype(bool)

    orient_fw = km["is_fw"][:, :, None] == tfwd
    key = (txp.astype(jnp.uint32) << jnp.uint32(1)) | \
        orient_fw.astype(jnp.uint32)
    key = jnp.where(ovalid, key, INVALID_KEY)
    rpos = jnp.broadcast_to(
        (jnp.arange(P, dtype=jnp.int32) * stride)[None, :, None],
        (R, P, C))
    diag = jnp.where(orient_fw, tpos - rpos, tpos + rpos)
    return key, rpos, diag, ovalid


def _segmented_min(values, seg_start, axis=1):
    """Per-run minimum via associative scan with segment resets."""
    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))
    _, out = jax.lax.associative_scan(
        combine, (seg_start, values), axis=axis)
    return out


def score_candidates(key, rpos, diag, max_cands: int):
    """Sort hits per read and reduce runs to top-T candidates.

    Args:
      key/rpos/diag: (R, N) flattened hit tensors (N = P*C).
      max_cands: T — candidates kept per read end.

    Returns dict of (R, T):
      txp (int32), is_fw (bool), score (int32, #distinct supporting read
      positions), min_diag (int32), valid (bool).
    """
    R, N = key.shape
    key_s, rpos_s, diag_s = jax.lax.sort(
        (key, rpos, diag), dimension=1, num_keys=2, is_stable=False)

    valid = key_s != INVALID_KEY
    prev_key = jnp.concatenate(
        [jnp.full((R, 1), INVALID_KEY), key_s[:, :-1]], axis=1)
    prev_rpos = jnp.concatenate(
        [jnp.full((R, 1), -1, jnp.int32), rpos_s[:, :-1]], axis=1)
    next_key = jnp.concatenate(
        [key_s[:, 1:], jnp.full((R, 1), INVALID_KEY)], axis=1)

    run_start = valid & (key_s != prev_key)
    run_end = valid & (key_s != next_key)
    uniq = valid & (run_start | (rpos_s != prev_rpos))

    cum = jnp.cumsum(uniq.astype(jnp.int32), axis=1)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (R, N))
    sidx = jax.lax.cummax(jnp.where(run_start, idx, 0), axis=1)
    cum_at_start = jnp.take_along_axis(cum, sidx, axis=1)
    run_score = cum - cum_at_start + 1  # uniq at run start is always 1

    min_diag = _segmented_min(diag_s, run_start, axis=1)

    end_score = jnp.where(run_end, run_score, 0)
    top_score, top_idx = jax.lax.top_k(end_score, max_cands)
    g = lambda a: jnp.take_along_axis(a, top_idx, axis=1)
    top_key = g(key_s)
    out_valid = top_score > 0
    return {
        "txp": (top_key >> jnp.uint32(1)).astype(jnp.int32),
        "is_fw": (top_key & jnp.uint32(1)).astype(bool),
        "score": top_score,
        "min_diag": g(min_diag),
        "valid": out_valid,
    }


def candidate_read_start(cand: dict, read_len, k: int):
    """Inferred read start position on the transcript for each candidate.

    fw: start = min(tpos - rpos); rc: start = min(tpos + rpos) + k - len.
    """
    return jnp.where(
        cand["is_fw"], cand["min_diag"],
        cand["min_diag"] + k - read_len[:, None])
