"""Mate pairing and library-format compatibility on device.

TPU re-expression of pufferfish's joinReadsAndFilter (consumed at
src/quant/SalmonQuantify.cpp:1339-1341) + the observed-format / compat
machinery (src/util/SalmonUtils.cpp:531-576 hitType, :271-298
compatibleHit): all T x T candidate combinations per fragment are evaluated
in one batched tensor op, reduced to the top T2 joined hits.

Orphan semantics follow the reference: orphaned ends are only considered
for a fragment when it has no concordant (paired) mapping at all
(MergeResult HAD_NONE -> orphans; SalmonQuantify.cpp:1344-1420).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# mate-status codes for joined hits
MS_PAIRED = 0
MS_LEFT_ORPHAN = 1
MS_RIGHT_ORPHAN = 2

# observed paired orientation codes (must match utils.libformat OBS_*)
OBS_ISF, OBS_OSF, OBS_ISR, OBS_OSR, OBS_MSF, OBS_MSR = range(6)


def observed_paired_code(s1, fw1, s2, fw2):
    """Vectorized observed library-format code (reference hitType,
    SalmonUtils.cpp:531-576)."""
    opp = fw1 != fw2
    code = jnp.where(
        opp & fw1, jnp.where(s1 <= s2, OBS_ISF, OBS_OSF),
        jnp.where(opp, jnp.where(s2 <= s1, OBS_ISR, OBS_OSR),
                  jnp.where(fw1, OBS_MSF, OBS_MSR)))
    return code.astype(jnp.int32)


def join_pairs(cand_l: dict, cand_r: dict, start_l, start_r,
               len_l, len_r, max_pair_cands: int, fld_max: int,
               allow_dovetail: bool = False):
    """Join left/right candidate sets into fragment-level hits.

    Sort-merge join: every candidate is keyed by
    (txp, normalized-orientation) such that opposite-strand mates that
    would form a fragment sort ADJACENT (left end first); a single
    2T-wide multi-operand sort + adjacency test replaces the T x T outer
    product the naive formulation needs (a 64x speedup of the pairing
    stage's sort/top_k width). Divergence from the reference
    joinReadsAndFilter: same-orientation (MSF/MSR) pairings are not
    formed — the reference only keeps them as incompat-prior-penalized
    leftovers and real libraries are opposite-strand.

    Args:
      cand_l/cand_r: dicts from score_candidates (txp, is_fw, score, valid),
        each (R, T).
      start_l/start_r: (R, T) inferred read-start positions on the txp.
      len_l/len_r: (R,) read lengths.
      max_pair_cands: T2 hits kept per fragment.
      fld_max: maximum plausible fragment length.

    Returns dict of (R, T2): txp, score, frag_len, pos (fragment leftmost),
    obs_code, valid, plus (R,) `has_pair`.
    """
    R, T = cand_l["txp"].shape
    BIG = jnp.uint32(0xFFFFFFFF)

    # pair key: (txp * 2 + orient) for the left end, (txp * 2 +
    # (1 - orient)) for the right -> a fw-left/rc-right (or rc-left/
    # fw-right) pair on one transcript shares the high bits; the low bit
    # tags left(0)/right(1) so the pair sorts adjacent, left first. A
    # single packed uint32 sort key keeps the comparator one-operand.
    def keyed(cand, start, is_left):
        o = cand["is_fw"].astype(jnp.uint32)
        if not is_left:
            o = jnp.uint32(1) - o
        key = (((cand["txp"].astype(jnp.uint32) << jnp.uint32(1)) | o)
               << jnp.uint32(1)) | jnp.uint32(0 if is_left else 1)
        key = jnp.where(cand["valid"], key, BIG)
        return (key, cand["score"], start, cand["is_fw"].astype(jnp.int32))

    kl = keyed(cand_l, start_l, True)
    kr = keyed(cand_r, start_r, False)
    cat = lambda i: jnp.concatenate([kl[i], kr[i]], axis=1)
    key, score, start, isfw = (cat(i) for i in range(4))

    key_s, score_s, start_s, isfw_s = jax.lax.sort(
        (key, score, start, isfw), dimension=1, num_keys=1,
        is_stable=False)

    # adjacency: slot i is a pair iff the next slot has the same high bits
    # and this slot is the left (even) tag
    nxt = lambda a, fill: jnp.concatenate(
        [a[:, 1:], jnp.full((R, 1), fill, a.dtype)], axis=1)
    nkey = nxt(key_s, BIG)
    is_pair = ((key_s | jnp.uint32(1)) == (nkey | jnp.uint32(1))) & \
        ((key_s & jnp.uint32(1)) == 0) & ((nkey & jnp.uint32(1)) == 1) & \
        (key_s != BIG) & (nkey != BIG)

    s1 = start_s                      # left mate start
    s2 = nxt(start_s, 0)              # right mate start
    fw1 = isfw_s.astype(bool)
    fw2 = nxt(isfw_s, 0).astype(bool)
    e1 = s1 + len_l[:, None]
    e2 = s2 + len_r[:, None]
    frag_start = jnp.minimum(s1, s2)
    frag_end = jnp.maximum(e1, e2)
    frag_len = frag_end - frag_start

    # dovetail: mate starts before its partner in an inward pair
    # (reference: MappingConstraintPolicy.noDovetail, default true)
    dovetail = jnp.where(fw1 & ~fw2, s2 < s1,
                         jnp.where(fw2 & ~fw1, s1 < s2, False))
    geom_ok = (frag_len > 0) & (frag_len <= fld_max)
    if not allow_dovetail:
        geom_ok = geom_ok & ~dovetail

    ok = is_pair & geom_ok
    obs = observed_paired_code(s1, fw1, s2, fw2)
    pair_score = jnp.where(ok, score_s + nxt(score_s, 0), 0)

    # fragments whose only pairings were dovetail-rejected (feeds the
    # num_dovetail_fragments counter, SalmonQuantify.cpp:2729)
    dove_rej = is_pair & dovetail & (frag_len > 0) \
        & (frag_len <= fld_max) & ~ok
    has_dovetail_only = dove_rej.any(axis=1) & ~(ok.any(axis=1))

    # top-T2 by score with payloads riding one descending sort
    T2 = max_pair_cands
    _, t_score, t_key, t_flen, t_pos, t_obs, t_fw = jax.lax.sort(
        (-pair_score, pair_score, key_s, frag_len, frag_start, obs,
         fw1.astype(jnp.int32)), dimension=1, num_keys=1, is_stable=False)
    valid_out = t_score[:, :T2] > 0
    has_pair = valid_out.any(axis=1)
    def fit(a, fill=0):
        # the joined width is min(2T, T2): at small occ_cap x stride the
        # candidate width T can drop below T2/2, so pad like orphan_hits
        # does — merge_paired_with_orphans requires (R, T2) from both
        if a.shape[1] >= T2:
            return a[:, :T2]
        pad = jnp.full((a.shape[0], T2 - a.shape[1]), fill, a.dtype)
        return jnp.concatenate([a, pad], axis=1)

    return {
        "txp": fit((t_key >> jnp.uint32(2)).astype(jnp.int32)),
        "score": fit(t_score),
        "frag_len": fit(t_flen),
        "pos": fit(t_pos),
        "obs_code": fit(t_obs),
        "fw": fit(t_fw).astype(bool),
        "valid": fit(valid_out),
        "has_pair": has_pair,
        "has_dovetail_only": has_dovetail_only,
    }


def orphan_hits(cand: dict, start, mate_status: int, max_pair_cands: int):
    """Format one end's candidates as orphan fragment hits (used when the
    fragment has no concordant pair)."""
    T2 = max_pair_cands
    s = jnp.where(cand["valid"], cand["score"], 0)
    _, score, txp, pos, fw = jax.lax.sort(
        (-s, s, cand["txp"], start, cand["is_fw"].astype(jnp.int32)),
        dimension=1, num_keys=1, is_stable=False)

    def fit(a, fill=0):
        # candidate width can be BELOW T2 (max_cands > windows*occ_cap
        # at small occ_cap): pad so merge_paired_with_orphans always
        # sees (R, T2)
        if a.shape[1] >= T2:
            return a[:, :T2]
        pad = jnp.full((a.shape[0], T2 - a.shape[1]), fill, a.dtype)
        return jnp.concatenate([a, pad], axis=1)

    score = fit(score)
    return {
        "txp": fit(txp),
        "score": score,
        "frag_len": jnp.zeros_like(score),
        "pos": fit(pos),
        "obs_code": jnp.full_like(score, -1),
        "fw": fit(fw).astype(bool),
        "valid": score > 0,
        "mate_status": mate_status,
    }


def merge_paired_with_orphans(paired: dict, orph_l: dict, orph_r: dict,
                              discard_orphans: bool):
    """Fragment-level selection: paired hits when any exist, else the
    better orphan set (reference MergeResult semantics).

    Returns joined dict of (R, T2) plus mate_status (R,).
    """
    has_pair = paired["has_pair"]
    l_best = jnp.where(orph_l["valid"], orph_l["score"], 0).max(axis=1)
    r_best = jnp.where(orph_r["valid"], orph_r["score"], 0).max(axis=1)
    use_left = l_best >= r_best
    if discard_orphans:
        sel_orph = {k: jnp.zeros_like(v) for k, v in orph_l.items()
                    if k != "mate_status"}
        sel_orph["valid"] = jnp.zeros_like(orph_l["valid"])
        ms_orph = jnp.zeros_like(l_best)
    else:
        sel_orph = {
            k: jnp.where(use_left[:, None], orph_l[k], orph_r[k])
            for k in ("txp", "score", "frag_len", "pos", "obs_code", "fw",
                      "valid")}
        ms_orph = jnp.where(use_left, MS_LEFT_ORPHAN, MS_RIGHT_ORPHAN)

    out = {}
    for k in ("txp", "score", "frag_len", "pos", "obs_code", "fw", "valid"):
        out[k] = jnp.where(has_pair[:, None], paired[k], sel_orph[k])
    out["mate_status"] = jnp.where(has_pair, MS_PAIRED, ms_orph)
    return out
