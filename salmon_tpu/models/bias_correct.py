"""Orchestration of bias-aware effective-length correction.

Host-side driver over the device passes in bias.py / bias_expected.py —
the role of updateEffectiveLengths (src/util/SalmonUtils.cpp:1208-1980)
called from CollapsedEMOptimizer::optimize (:900-928).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from salmon_tpu.models import bias as B
from salmon_tpu.models import bias_expected as BE

logger = logging.getLogger("salmon_tpu")


POS_RATIO_MAX = 10.0  # spline-noise guard on sparse length classes


def _pos_factor_grid(obs_masses, exp_masses, uniform_knots=False):
    """(5, POS_GRID) obs/exp positional factor ratio tables, clamped to
    [1/POS_RATIO_MAX, POS_RATIO_MAX] (divergence from the reference,
    which leaves the spline ratio unclamped: sparse length classes
    otherwise produce multi-x noise factors)."""
    grid = np.ones((B.POS_LENGTH_CLASSES, BE.POS_GRID))
    for li in range(B.POS_LENGTH_CLASSES):
        # +1 pseudocount per bin (the reference's SimplePosBias starts
        # each bin at LOG_1, i.e. mass 1.0: SimplePosBias.cpp ctor)
        o = B.pos_project_weights(obs_masses[li] + 1.0, BE.POS_GRID,
                                  uniform_knots)
        e = B.pos_project_weights(exp_masses[li] + 1.0, BE.POS_GRID,
                                  uniform_knots)
        if obs_masses[li].sum() > 0 and exp_masses[li].sum() > 0:
            grid[li] = np.clip(o / np.maximum(e, 1e-5),
                               1.0 / POS_RATIO_MAX, POS_RATIO_MAX)
    return grid


def _gc_ratio(obs, exp, max_ratio=B.GC_RATIO_MAX):
    """GCFragModel::ratio with per-conditional-bin normalization."""
    o = np.asarray(obs, dtype=np.float64)
    e = np.asarray(exp, dtype=np.float64)
    o_n = o / np.maximum(o.sum(axis=1, keepdims=True), 1e-300)
    e_n = e / np.maximum(e.sum(axis=1, keepdims=True), 1e-300)
    r = np.where(e_n > 0, o_n / np.maximum(e_n, 1e-300), 1.0)
    r = np.where((o_n <= 0) & (e_n <= 0), 1.0, r)
    return np.clip(r, 1.0 / max_ratio, max_ratio)


def _gc_percent_to_bin(n_bins: int) -> np.ndarray:
    """GCDesc::fragBin(n): percent (0..100) -> bin under an n-bin model
    (GCFragModel.hpp:19-22)."""
    p = np.arange(101)
    return np.minimum(n_bins - 1, (p / (100.0 / n_bins)).astype(np.int64))


def fold_gc_counts(mat101, n_bins: int, cond_bins: int) -> np.ndarray:
    """Fold percent-resolution (3, 101) GC masses into the configured
    (cond_bins, n_bins) model — the device always collects at percent
    resolution (a superset), so --numGCBins/--conditionalGCBins are a
    lossless host-side re-bin (reference default: 3 x 25,
    SalmonDefaults.hpp:105-106; gcBias without seqBias collapses the
    conditional axis, QuantOptionsUtils.cpp:505-507)."""
    m = np.asarray(mat101, np.float64)
    if cond_bins == 1:
        m = m.sum(axis=0, keepdims=True)
    b = _gc_percent_to_bin(n_bins)
    out = np.zeros((m.shape[0], n_bins))
    np.add.at(out, (np.arange(m.shape[0])[:, None],
                    np.broadcast_to(b, (m.shape[0], 101))), m)
    return out


def expand_gc_ratio(ratio_n: np.ndarray, n_bins: int,
                    cond_bins: int) -> np.ndarray:
    """Expand a (cond_bins, n_bins) ratio table back to the device's
    fixed (3, 101) percent-resolution lookup (each percent reads its
    bin's ratio; a collapsed conditional axis broadcasts)."""
    r = np.asarray(ratio_n, np.float64)[:, _gc_percent_to_bin(n_bins)]
    if cond_bins == 1:
        r = np.broadcast_to(r, (B.GC_COND_BINS, 101)).copy()
    return r


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))
def _expected_bucket_jit(codes, lens, weights, len_class, cdf, _pad,
                         fld_low, fld_high, gc_samp, seq_bias, gc_bias,
                         pos_bias):
    return BE.expected_pass_bucket(codes, lens, weights, len_class, cdf,
                                   fld_low, fld_high, gc_samp, seq_bias,
                                   gc_bias, pos_bias)


@functools.partial(jax.jit, static_argnums=(13, 14, 15, 16, 17))
def _efflen_bucket_jit(codes, lens, eff_in, process_row, len_class, cdf,
                       obs5, exp5, obs3, exp3, gc_ratio, grid_fw, grid_rc,
                       fld_low, fld_high, gc_samp, seq_gc_pos, _pad):
    seq_bias, gc_bias, pos_bias, no_threshold = seq_gc_pos
    return BE.efflen_pass_bucket(
        codes, lens, eff_in, process_row, len_class, cdf, fld_low,
        fld_high, gc_samp, obs5, exp5, obs3, exp3, gc_ratio, grid_fw,
        grid_rc, seq_bias, gc_bias, pos_bias, no_threshold)


class BiasState:
    """All learned bias state + the recompute entry point."""

    def __init__(self, index, opts):
        self.opts = opts
        self.index = index
        self.obs = B.BiasObservations()
        n = index.num_valid_targets
        self.length_class = np.clip(np.searchsorted(
            B.length_class_bounds(index.lengths[:n]),
            index.lengths[:n], side="right"), 0,
            B.POS_LENGTH_CLASSES - 1).astype(np.int32)
        self.buckets = BE.bucket_transcripts(
            index.transcript_codes, index.lengths[:n])
        self.enabled = (opts.seq_bias_correct or opts.gc_bias_correct
                       or opts.pos_bias_correct)

    def corrected_effective_lengths(self, alphas: np.ndarray,
                                    eff_in: np.ndarray,
                                    fld_pmf: np.ndarray) -> np.ndarray:
        """The updateEffectiveLengths analog. alphas/eff_in over valid
        (non-decoy) targets."""
        o = self.opts
        seq_b, gc_b, pos_b = (o.seq_bias_correct, o.gc_bias_correct,
                              o.pos_bias_correct)
        if gc_b and self.obs.gc_frac_fwd() < 0:
            logger.warning("no fragments to estimate fwd/rc rate; "
                           "skipping bias correction")
            return eff_in

        cdf = jnp.asarray(np.cumsum(fld_pmf), jnp.float32)
        fld_low, fld_high = BE.fld_quantile_bounds(fld_pmf)
        gc_samp = int(o.bias_speed_samp)

        weights = np.where(alphas >= BE.MIN_ALPHA_BG,
                           alphas / np.maximum(eff_in, 1.0), 0.0)
        skip = getattr(self, "skip_bias", None)
        if skip is not None:
            # --auxTargetFile targets are excluded from the background
            # and never bias-corrected (reference skipBiasCorrection,
            # SalmonUtils.cpp:1507)
            weights[skip[:weights.shape[0]]] = 0.0
        n_bg = int((weights > 0).sum())
        cutoff = min(150, max(1, int(0.1 * n_bg)))
        if n_bg < cutoff or n_bg == 0:
            logger.warning("only %d background transcripts; skipping bias "
                           "correction", n_bg)
            return eff_in

        # --- pass 1: expected statistics over buckets
        exp5 = np.zeros((B.SB_ROWS, B.SB_CTX))
        exp3 = np.zeros((B.SB_ROWS, B.SB_CTX))
        gc_exp = np.zeros((B.GC_COND_BINS, B.GC_BINS))
        pos5_exp = np.zeros((B.POS_LENGTH_CLASSES, B.POS_BINS))
        pos3_exp = np.zeros((B.POS_LENGTH_CLASSES, B.POS_BINS))
        for idxs, mat in self.buckets:
            out = _expected_bucket_jit(
                jnp.asarray(mat), jnp.asarray(
                    self.index.lengths[idxs].astype(np.int32)),
                jnp.asarray(weights[idxs], jnp.float32),
                jnp.asarray(self.length_class[idxs]), cdf, mat.shape[1],
                fld_low, fld_high, gc_samp, seq_b, gc_b, pos_b)
            if seq_b:
                exp5 += np.asarray(out["exp5"], dtype=np.float64)
                exp3 += np.asarray(out["exp3"], dtype=np.float64)
            if gc_b:
                gc_exp += np.asarray(out["gc_exp"], dtype=np.float64)
            if pos_b:
                pos5_exp += np.asarray(out["pos5"], dtype=np.float64)
                pos3_exp += np.asarray(out["pos3"], dtype=np.float64)
        self.exp5_counts, self.exp3_counts = exp5, exp3
        self.gc_exp, self.pos5_exp, self.pos3_exp = gc_exp, pos5_exp, \
            pos3_exp

        # --- normalize models
        zeros = np.zeros((B.SB_ROWS, B.SB_CTX))
        obs5_logp = B.sb_normalize(self.obs.obs5) if seq_b else zeros
        obs3_logp = B.sb_normalize(self.obs.obs3) if seq_b else zeros
        exp5_logp = B.sb_normalize(exp5) if seq_b else zeros
        exp3_logp = B.sb_normalize(exp3) if seq_b else zeros
        if gc_b:
            n_gc = int(getattr(o, "num_gc_bins", 25))
            n_cond = int(getattr(o, "conditional_gc_bins", 3))
            self.gc_obs_model = fold_gc_counts(self.obs.gc_obs, n_gc,
                                               n_cond)
            self.gc_exp_model = fold_gc_counts(gc_exp, n_gc, n_cond)
            gc_ratio = expand_gc_ratio(
                _gc_ratio(self.gc_obs_model, self.gc_exp_model),
                n_gc, n_cond)
        else:
            gc_ratio = np.ones((B.GC_COND_BINS, B.GC_BINS))
        if pos_b:
            corrected = bool(getattr(o, "pos_bias_corrected", False))
            grid_fw = _pos_factor_grid(self.obs.pos5, pos5_exp,
                                       uniform_knots=corrected)
            if corrected:
                # --posBiasCorrected: the 5'/3' start distributions are
                # marginals of ONE positional distribution linked by the
                # fragment length; multiplying both factors double-counts
                # it (posbias_reference_trace.py defect #1), so the
                # corrected integral uses the fw marginal only
                grid_rc = np.ones((B.POS_LENGTH_CLASSES, BE.POS_GRID))
            else:
                grid_rc = _pos_factor_grid(self.obs.pos3, pos3_exp)
        else:
            grid_fw = np.ones((B.POS_LENGTH_CLASSES, BE.POS_GRID))
            grid_rc = np.ones((B.POS_LENGTH_CLASSES, BE.POS_GRID))

        # --- pass 2: per-transcript corrected effective lengths
        eff_out = eff_in.copy()
        process = (alphas >= BE.MIN_ALPHA_BG) & (
            self.index.lengths[:alphas.shape[0]] - eff_in > 0)
        if skip is not None:
            process &= ~skip[:process.shape[0]]
        for idxs, mat in self.buckets:
            eff_b = _efflen_bucket_jit(
                jnp.asarray(mat),
                jnp.asarray(self.index.lengths[idxs].astype(np.int32)),
                jnp.asarray(eff_in[idxs], jnp.float32),
                jnp.asarray(process[idxs]),
                jnp.asarray(self.length_class[idxs]), cdf,
                jnp.asarray(obs5_logp, jnp.float32),
                jnp.asarray(exp5_logp, jnp.float32),
                jnp.asarray(obs3_logp, jnp.float32),
                jnp.asarray(exp3_logp, jnp.float32),
                jnp.asarray(gc_ratio, jnp.float32),
                jnp.asarray(grid_fw, jnp.float32),
                jnp.asarray(grid_rc, jnp.float32),
                fld_low, fld_high, gc_samp,
                (seq_b, gc_b, pos_b,
                 bool(getattr(o, "no_bias_length_threshold", False))),
                mat.shape[1])
            eff_out[idxs] = np.asarray(eff_b, dtype=np.float64)
        return eff_out
