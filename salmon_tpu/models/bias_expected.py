"""Expected-bias pass and bias-aware effective lengths.

Reference: updateEffectiveLengths (src/util/SalmonUtils.cpp:1208-1980):
pass 1 accumulates the abundance-weighted *expected* seq/GC/pos statistics
over the whole transcriptome; pass 2 recomputes each transcript's effective
length as sum_fl flWeight * sum_pos (seqFW[s] * seqRC[e] * gcRatio(desc) *
posFW[s] * posRC[e]).

TPU design: transcripts are bucketed by padded length into (B, Lmax) code
matrices. Both passes are jitted per bucket; the fragment-length loop is a
fori_loop whose body is shifted elementwise VPU work + one small scatter.
Divergence from the reference (documented): the context-GC for expected
fragments uses the gcDesc window formulas (Transcript.hpp:294-345) rather
than populateContextCounts' one-off-by-one variant, so observed and
expected context bins are computed identically here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from salmon_tpu.models.bias import (GC_BINS, GC_COND_BINS, GC_CTX_INSIDE,
                                    GC_CTX_OUTSIDE, POS_BINS,
                                    POS_LENGTH_CLASSES, SB_CONTEXT_LEFT,
                                    SB_CTX, SB_ROWS, sb_context_indices,
                                    pos_bin_of)

MIN_ALPHA_BG = 1e-8   # minAlpha cutoff for background transcripts
MIN_CDF_MASS = 1e-10
POS_GRID = 1024       # spline factor grid resolution (device lookup)


def fld_quantile_bounds(pmf: np.ndarray, lo_q=0.005):
    """fldLow/fldHigh quantile cutoffs (SalmonUtils.cpp:1262-1290)."""
    cdf = np.cumsum(pmf)
    lo = int(np.searchsorted(cdf, lo_q))
    hi = int(np.searchsorted(cdf, 1.0 - lo_q))
    return max(1, lo), max(lo + 1, min(hi, pmf.shape[0] - 1))


def bucket_transcripts(codes_list, lengths, pad_to=(256, 512, 1024, 2048,
                                                    4096, 8192, 16384,
                                                    32768, 65536)):
    """Group transcript indices by padded length; returns list of
    (txp_idx array, (B, Lmax) code matrix)."""
    lengths = np.asarray(lengths)
    buckets = {}
    for i, L in enumerate(lengths):
        for p in pad_to:
            if L <= p:
                buckets.setdefault(p, []).append(i)
                break
        else:
            buckets.setdefault(pad_to[-1], []).append(i)
    out = []
    for p, idxs in sorted(buckets.items()):
        mat = np.full((len(idxs), p), 4, dtype=np.uint8)
        for r, i in enumerate(idxs):
            c = codes_list(i)[:p]
            mat[r, :c.shape[0]] = c
        out.append((np.array(idxs, dtype=np.int64), mat))
    return out


def _row_tables(codes, lens):
    """Per-row helpers: gc prefix sums and position iota."""
    B, L = codes.shape
    is_gc = ((codes == 1) | (codes == 2)).astype(jnp.int32)
    gcum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(is_gc, axis=1)], axis=1)
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    return gcum, pos


def _conditional_cdf(cdf, x, cdf_max_arg, cdf_max_val):
    """cdf(min(x, maxArg)) / maxVal per row (SalmonUtils.cpp:1524-1528)."""
    xi = jnp.minimum(x, cdf_max_arg)
    v = jnp.take(cdf, jnp.clip(xi, 0, cdf.shape[0] - 1), mode="clip")
    return jnp.where(x > cdf_max_arg, 1.0,
                     v / jnp.maximum(cdf_max_val, MIN_CDF_MASS))


def _seq_ctx_fw(codes, L):
    """(B, L, 9) fw context codes for window starting at each position
    (clamped at the edge; callers mask validity)."""
    cols = [jnp.clip(codes[:, j:j + L - SB_CTX + 1], 0, 3)
            for j in range(SB_CTX)]
    return jnp.stack(cols, axis=-1)  # (B, L-8, 9)


def _seq_ctx_rc(codes, L):
    """(B, L-8, 9) rc context for the window ENDING analogue: window w
    covers fw bases w..w+8; the rc read's 5' end sits at fw position
    w+5 and its context reads bases w+8..w complemented."""
    cols = [3 - jnp.clip(codes[:, SB_CTX - 1 - j:L - j], 0, 3)
            for j in range(SB_CTX)]
    return jnp.stack(cols, axis=-1)


def _gc_context_frac(gcum, lens, start, stop):
    """Vectorized gcDesc context fraction (bias.py _gc_desc, row form).
    start/stop: (B, L) per-position candidate windows."""
    last = lens[:, None] - 1

    def cum_at(p):
        return jnp.take_along_axis(
            gcum, jnp.clip(p, 0, lens[:, None]), axis=1)

    fs = start - (GC_CTX_OUTSIDE + 1)
    fe = start + (GC_CTX_INSIDE - 1)
    ts = stop - GC_CTX_INSIDE
    te = stop + GC_CTX_OUTSIDE
    fs_c = jnp.maximum(fs, 0)
    fe_c = jnp.minimum(fe, last)
    ts_c = jnp.maximum(ts, 0)
    te_c = jnp.minimum(te, last)
    fp_gc = cum_at(fe_c + 1) - cum_at(fs_c)
    tp_gc = cum_at(te_c + 1) - cum_at(ts_c)
    fp_size = jnp.where(fs < 0, fe_c + 1, fe_c - fs_c)
    tp_size = jnp.where(ts < 0, te_c + 1, te_c - ts_c)
    ctx = (fp_size + tp_size).astype(jnp.float32)
    frac = jnp.where(ctx > 0, jnp.round(
        100.0 * (fp_gc + tp_gc) / jnp.maximum(ctx, 1.0)), 0.0)
    w = 100.0 / GC_COND_BINS
    return jnp.minimum(GC_COND_BINS - 1,
                       (frac / w).astype(jnp.int32))


def expected_pass_bucket(codes, lens, weights, len_class, cdf,
                         fld_low: int, fld_high: int, gc_samp: int,
                         seq_bias: bool, gc_bias: bool, pos_bias: bool):
    """Pass 1 for one bucket: abundance-weighted expected statistics.

    codes: (B, Lmax) uint8; lens: (B,) int32; weights: (B,) f32
    (alpha/effLen, zero for excluded rows); len_class: (B,) int32.
    Returns dict of exp5/exp3 (64,9), gc_exp (3,101), pos5/pos3 (5,20).
    """
    B, L = codes.shape
    c = codes.astype(jnp.int32)
    gcum, pos = _row_tables(c, lens)
    cdf_max_arg = jnp.minimum(cdf.shape[0] - 1, lens)
    cdf_max_val = jnp.take(cdf, cdf_max_arg, mode="clip")
    row_ok = (weights > 0) & (cdf_max_val > MIN_CDF_MASS)
    wrow = jnp.where(row_ok, weights, 0.0)

    out = {}
    P = L - SB_CTX + 1
    if seq_bias and P > 0:
        idx_fw = sb_context_indices(_seq_ctx_fw(c, L))   # (B, P, 9)
        idx_rc = sb_context_indices(_seq_ctx_rc(c, L))
        # weight per window w: condCDF(len - (w + contextLeft)) — the max
        # fragment length a read starting in this window could have
        # (SalmonUtils.cpp:1585-1597)
        wpos = pos[:, :P]
        max_fl = lens[:, None] - (wpos + SB_CONTEXT_LEFT)
        dens = _conditional_cdf(cdf, max_fl, cdf_max_arg[:, None],
                                cdf_max_val[:, None])
        wvalid = (wpos + SB_CTX <= lens[:, None]) & (max_fl >= 0)
        wv = jnp.where(wvalid, wrow[:, None] * dens, 0.0)

        def sb_scatter(idx, wv):
            flat = (idx * SB_CTX + jnp.arange(SB_CTX, dtype=jnp.int32)
                    [None, None, :]).reshape(-1)
            vals = jnp.broadcast_to(wv[:, :, None], idx.shape).reshape(-1)
            return jax.ops.segment_sum(
                vals, flat, num_segments=SB_ROWS * SB_CTX).reshape(
                SB_ROWS, SB_CTX)

        out["exp5"] = sb_scatter(idx_fw, wv)
        out["exp3"] = sb_scatter(idx_rc, wv)

    if pos_bias:
        dens_fw = _conditional_cdf(cdf, lens[:, None] - pos + 1,
                                   cdf_max_arg[:, None],
                                   cdf_max_val[:, None])
        dens_rc = _conditional_cdf(cdf, pos, cdf_max_arg[:, None],
                                   cdf_max_val[:, None])
        pvalid = pos < lens[:, None]
        bins = pos_bin_of(pos, lens[:, None])
        flat = (len_class[:, None] * POS_BINS + bins).reshape(-1)
        w5 = jnp.where(pvalid, wrow[:, None] * dens_fw, 0.0).reshape(-1)
        w3 = jnp.where(pvalid, wrow[:, None] * dens_rc, 0.0).reshape(-1)
        n = POS_LENGTH_CLASSES * POS_BINS
        out["pos5"] = jax.ops.segment_sum(w5, flat, num_segments=n).reshape(
            POS_LENGTH_CLASSES, POS_BINS)
        out["pos3"] = jax.ops.segment_sum(w3, flat, num_segments=n).reshape(
            POS_LENGTH_CLASSES, POS_BINS)

    if gc_bias:
        n_fl = max(1, (fld_high - fld_low) // gc_samp + 1)

        def body(i, acc):
            fl = fld_low + i * gc_samp
            start = pos
            stop = pos + fl - 1
            svalid = (stop < lens[:, None]) & row_ok[:, None]
            gc = (jnp.take_along_axis(gcum, jnp.clip(stop + 1, 0,
                                                     lens[:, None]), axis=1)
                  - jnp.take_along_axis(gcum, jnp.clip(start, 0,
                                                       lens[:, None]),
                                        axis=1))
            frag_bin = jnp.clip(jnp.round(100.0 * gc / fl).astype(jnp.int32),
                                0, 100)
            cond_bin = _gc_context_frac(gcum, lens, start, stop)
            fl_w = (_conditional_cdf(cdf, jnp.full((B, 1), fl),
                                     cdf_max_arg[:, None],
                                     cdf_max_val[:, None])
                    - _conditional_cdf(cdf, jnp.full((B, 1), fl - gc_samp),
                                       cdf_max_arg[:, None],
                                       cdf_max_val[:, None]))
            wv = jnp.where(svalid, wrow[:, None] * fl_w, 0.0).reshape(-1)
            flat = (cond_bin * GC_BINS + frag_bin).reshape(-1)
            return acc + jax.ops.segment_sum(
                wv, flat, num_segments=GC_COND_BINS * GC_BINS).reshape(
                GC_COND_BINS, GC_BINS)

        out["gc_exp"] = jax.lax.fori_loop(
            0, n_fl, body, jnp.zeros((GC_COND_BINS, GC_BINS), jnp.float32))

    return out


def efflen_pass_bucket(codes, lens, eff_in, process_row, len_class, cdf,
                       fld_low: int, fld_high: int, gc_samp: int,
                       obs5_logp, exp5_logp, obs3_logp, exp3_logp,
                       gc_ratio, pos_grid_fw, pos_grid_rc,
                       seq_bias: bool, gc_bias: bool, pos_bias: bool,
                       no_threshold: bool = False):
    """Pass 2 for one bucket: bias-corrected effective lengths.

    obs/exp *_logp: (64, 9) conditional log-prob tables (None-like zeros
    when seq_bias off); gc_ratio: (3, 101); pos_grid_*: (5, POS_GRID)
    obs/exp factor ratio evaluated on a fractional-position grid.
    Returns (B,) effective lengths (uncorrected rows -> eff_in).
    """
    B, L = codes.shape
    c = codes.astype(jnp.int32)
    gcum, pos = _row_tables(c, lens)
    cdf_max_arg = jnp.minimum(cdf.shape[0] - 1, lens)
    cdf_max_val = jnp.take(cdf, cdf_max_arg, mode="clip")
    row_ok = process_row & (cdf_max_val > MIN_CDF_MASS)

    # --- per-position seq factors
    if seq_bias:
        P = L - SB_CTX + 1
        idx_fw = sb_context_indices(_seq_ctx_fw(c, L))
        idx_rc = sb_context_indices(_seq_ctx_rc(c, L))

        def eval_logp(table, idx):
            g = jnp.take(table.reshape(-1),
                         idx * SB_CTX + jnp.arange(SB_CTX, dtype=jnp.int32)
                         [None, None, :], mode="clip")
            return jnp.sum(g, axis=-1)

        f_fw = jnp.exp(eval_logp(obs5_logp, idx_fw)
                       - eval_logp(exp5_logp, idx_fw))   # (B, P)
        f_rc = jnp.exp(eval_logp(obs3_logp, idx_rc)
                       - eval_logp(exp3_logp, idx_rc))
        # window w -> fw factor applies at read start s = w + 3; rc factor
        # applies at fragment end e = w + 5 (reference: seqFactors filled
        # at readStart then RC reversed, SalmonUtils.cpp:1845-1875)
        sfw = jnp.ones((B, L), jnp.float32)
        sfw = sfw.at[:, SB_CONTEXT_LEFT:SB_CONTEXT_LEFT + P].set(f_fw)
        src = jnp.ones((B, L), jnp.float32)
        src = src.at[:, SB_CTX - SB_CONTEXT_LEFT - 1:
                     SB_CTX - SB_CONTEXT_LEFT - 1 + P].set(f_rc)
        win_valid = pos[:, :P] + SB_CTX <= lens[:, None]
        sfw = sfw.at[:, SB_CONTEXT_LEFT:SB_CONTEXT_LEFT + P].set(
            jnp.where(win_valid, f_fw, 1.0))
        src = src.at[:, SB_CTX - SB_CONTEXT_LEFT - 1:
                     SB_CTX - SB_CONTEXT_LEFT - 1 + P].set(
            jnp.where(win_valid, f_rc, 1.0))
    else:
        sfw = jnp.ones((B, L), jnp.float32)
        src = jnp.ones((B, L), jnp.float32)

    if pos_bias:
        frac_idx = jnp.clip(
            (pos.astype(jnp.float32) / jnp.maximum(
                lens[:, None].astype(jnp.float32), 1.0)
             * POS_GRID).astype(jnp.int32), 0, POS_GRID - 1)
        lc = len_class[:, None]
        pfw = jnp.take(pos_grid_fw.reshape(-1),
                       lc * POS_GRID + frac_idx, mode="clip")
        prc = jnp.take(pos_grid_rc.reshape(-1),
                       lc * POS_GRID + frac_idx, mode="clip")
        sfw = sfw * pfw
        src = src * prc

    n_fl = max(1, (fld_high - fld_low) // gc_samp + 1)

    def body(i, acc):
        fl = fld_low + i * gc_samp
        # e = s + fl - 1: align src/gc windows by rolling left
        src_e = jnp.roll(src, -(fl - 1), axis=1)
        start = pos
        stop = pos + fl - 1
        svalid = stop < lens[:, None]
        frag = sfw * src_e
        if gc_bias:
            gc = (jnp.take_along_axis(gcum, jnp.clip(stop + 1, 0,
                                                     lens[:, None]), axis=1)
                  - jnp.take_along_axis(gcum, jnp.clip(start, 0,
                                                       lens[:, None]),
                                        axis=1))
            frag_bin = jnp.clip(jnp.round(100.0 * gc / fl).astype(jnp.int32),
                                0, 100)
            cond_bin = _gc_context_frac(gcum, lens, start, stop)
            frag = frag * jnp.take(gc_ratio.reshape(-1),
                                   cond_bin * GC_BINS + frag_bin,
                                   mode="clip")
        fl_mass = jnp.sum(jnp.where(svalid, frag, 0.0), axis=1)
        fl_w = (_conditional_cdf(cdf, jnp.full((B,), fl), cdf_max_arg,
                                 cdf_max_val)
                - _conditional_cdf(cdf, jnp.full((B,), fl - gc_samp),
                                   cdf_max_arg, cdf_max_val))
        return acc + fl_w * fl_mass

    eff = jax.lax.fori_loop(0, n_fl, body, jnp.zeros((B,), jnp.float32))
    unprocessed = jnp.maximum(
        lens.astype(jnp.float32) - eff_in, 0.0)
    if no_threshold:
        # --noBiasLengthThreshold (reference :1959-1964): take the raw
        # corrected length whenever it is meaningful
        out = jnp.where((unprocessed > 0.0) & (eff > 1.0), eff, eff_in)
    else:
        # barrier: keep within [min(elen, unprocessedLen), ...]
        # (reference :1955-1975):
        # effLensOut = max(eff, min(elenNoBias, unprocessedLen))
        offset = jnp.maximum(1.0, unprocessed)
        out = jnp.maximum(eff, jnp.minimum(eff_in, offset))
    return jnp.where(row_ok, out, eff_in)
