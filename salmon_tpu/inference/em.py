"""Collapsed EM / VBEM over CSR-packed equivalence classes.

Reference: src/inference/CollapsedEMOptimizer.cpp —
  EMUpdate_ (:179-234), VBEMUpdate_ (:242-328), optimize (:733-1040),
  populatePriorAlphas_ (:82-99), updateEqClassWeights (:693-730).

TPU design: the per-class gather/scatter loops become
segment_sum(gather(alpha) * w) — one fused jitted update; the convergence
loop is a lax.while_loop so the entire optimization is a single XLA
program. Bootstrap replicates vmap over the same update (SURVEY.md §2.11
item 6).

Numerics: the reference runs double precision throughout. On TPU we default
to float32 with a float64 numpy fallback (`engine="numpy"`) for validation
and small problems; the convergence criterion only inspects alphas > 1e-2,
which is robust under f32 (SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from salmon_tpu.constants import DEFAULTS
from salmon_tpu.inference.eqclasses import PackedEqClasses

MIN_EQ_WEIGHT = 1e-30     # minEQClassWeight analog (double-denormal in ref)
DIGAMMA_MIN = 1e-10


@dataclasses.dataclass
class EMConfig:
    use_vbem: bool = not DEFAULTS.use_em
    vb_prior: float = DEFAULTS.vb_prior
    per_transcript_prior: bool = DEFAULTS.per_transcript_prior
    rel_diff_tolerance: float = DEFAULTS.relative_diff_tolerance
    max_iterations: int = DEFAULTS.max_em_iterations
    min_iterations: int = DEFAULTS.min_required_iterations  # ref sets 100
    alpha_check_cutoff: float = DEFAULTS.alpha_check_cutoff
    min_alpha: float = DEFAULTS.min_alpha


def pad_eqclasses(eq: PackedEqClasses, pad_multiple: int = 256):
    """Pad CSR arrays to a bucketed size so jit recompiles rarely."""
    def padded(n):
        return max(pad_multiple, -(-n // pad_multiple) * pad_multiple)
    E = eq.labels.shape[0]
    Cl = eq.counts.shape[0]
    Ep, Clp = padded(E), padded(Cl)
    labels = np.zeros(Ep, dtype=np.int32)
    labels[:E] = eq.labels
    weights = np.zeros(Ep, dtype=np.float32)
    weights[:E] = eq.weights
    seg = np.full(Ep, Clp, dtype=np.int32)  # padding -> dummy segment Clp
    for_entries = np.repeat(np.arange(Cl, dtype=np.int32), eq.class_sizes)
    seg[:E] = for_entries
    counts = np.zeros(Clp, dtype=np.float32)
    counts[:Cl] = eq.counts
    sizes = np.zeros(Clp, dtype=np.int32)
    sizes[:Cl] = eq.class_sizes
    return {
        "labels": jnp.asarray(labels),
        "aux": jnp.asarray(weights),
        "seg": jnp.asarray(seg),
        "counts": jnp.asarray(counts),
        "class_sizes": jnp.asarray(sizes),
    }, (E, Cl, Ep, Clp)


def combined_weights(eqd: dict, eff_lens: jax.Array) -> jax.Array:
    """combinedWeights_i = count_j * aux_i / max(effLen_t, 1), normalized to
    sum to 1 within each class (reference optimize :830-873)."""
    el = jnp.maximum(jnp.take(eff_lens, eqd["labels"], mode="clip"), 1.0)
    n_seg = eqd["counts"].shape[0] + 1
    w = jnp.take(eqd["counts"], eqd["seg"], mode="clip") * eqd["aux"] / el
    w = jnp.where(eqd["seg"] < eqd["counts"].shape[0], w, 0.0)
    wsum = jax.ops.segment_sum(w, eqd["seg"], num_segments=n_seg)
    denom = jnp.take(wsum, eqd["seg"], mode="clip")
    return jnp.where(denom > 0, w / denom, 0.0)


def _em_body(alpha, cw, eqd, num_txps: int, exptheta_fn=None):
    """One EM (or VBEM if exptheta_fn) update: returns alpha_out."""
    n_cl = eqd["counts"].shape[0]
    base = alpha if exptheta_fn is None else exptheta_fn(alpha)
    gamma = jnp.take(base, eqd["labels"], mode="clip") * cw
    gamma = jnp.where(eqd["seg"] < n_cl, gamma, 0.0)
    denom = jax.ops.segment_sum(gamma, eqd["seg"], num_segments=n_cl + 1)
    d = jnp.take(denom, eqd["seg"], mode="clip")
    contrib = jnp.where(d > MIN_EQ_WEIGHT,
                        jnp.take(eqd["counts"], eqd["seg"], mode="clip")
                        * gamma / jnp.maximum(d, MIN_EQ_WEIGHT), 0.0)
    # singleton classes always get their full count (reference :225-227)
    is_singleton = jnp.take(eqd["class_sizes"], eqd["seg"], mode="clip") == 1
    contrib = jnp.where(is_singleton,
                        jnp.take(eqd["counts"], eqd["seg"], mode="clip"),
                        contrib)
    contrib = jnp.where(eqd["seg"] < n_cl, contrib, 0.0)
    return jax.ops.segment_sum(contrib, eqd["labels"],
                               num_segments=num_txps)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def run_em(eqd: dict, alpha0: jax.Array, prior: jax.Array,
           num_txps: int, use_vbem: bool, tol: float,
           min_iter: int, max_iter: int, _ver: int = 0,
           eff_lens: Optional[jax.Array] = None):
    """Full optimization loop as one XLA program.

    Returns (alpha, n_iters, max_rel_diff, n_degenerate, available).
    """
    cw = combined_weights(eqd, eff_lens)

    # markDegenerateClasses (reference CollapsedEMOptimizer.cpp:331-394):
    # classes whose members' combined initial weight is ~zero are dropped
    # from every update (their counts contribute nothing); transcripts in
    # surviving classes are "available" for bias length recomputation.
    n_cl = eqd["counts"].shape[0]
    g0 = jnp.take(alpha0, eqd["labels"], mode="clip") * cw
    g0 = jnp.where(eqd["seg"] < n_cl, g0, 0.0)
    denom0 = jax.ops.segment_sum(g0, eqd["seg"], num_segments=n_cl + 1)
    degenerate = (denom0[:n_cl] <= MIN_EQ_WEIGHT) & (eqd["class_sizes"] > 0)
    n_degenerate = jnp.sum(degenerate.astype(jnp.int32))
    eqd = dict(eqd)
    eqd["counts"] = jnp.where(degenerate, 0.0, eqd["counts"])
    entry_live = (eqd["seg"] < n_cl) & ~jnp.take(
        degenerate, jnp.clip(eqd["seg"], 0, n_cl - 1), mode="clip")
    available = jnp.zeros(num_txps, bool).at[
        jnp.clip(eqd["labels"], 0, num_txps - 1)].max(entry_live)

    if use_vbem:
        def exptheta(a):
            ap = a + prior
            log_norm = jax.scipy.special.digamma(jnp.sum(ap))
            return jnp.where(
                ap > DIGAMMA_MIN,
                jnp.exp(jax.scipy.special.digamma(
                    jnp.maximum(ap, DIGAMMA_MIN)) - log_norm),
                0.0)
        step = lambda a: _em_body(a, cw, eqd, num_txps, exptheta)
    else:
        step = lambda a: _em_body(a, cw, eqd, num_txps, None)

    cutoff = DEFAULTS.alpha_check_cutoff

    def cond(state):
        alpha, it, converged, _ = state
        return (it < min_iter) | ((it < max_iter) & ~converged)

    def body(state):
        alpha, it, _, _ = state
        alpha_p = step(alpha)
        check = alpha_p > cutoff
        rel = jnp.where(check,
                        jnp.abs(alpha - alpha_p)
                        / jnp.maximum(alpha_p, 1e-30), 0.0)
        mrd = jnp.max(rel)
        return alpha_p, it + 1, mrd <= tol, mrd

    alpha, iters, converged, mrd = jax.lax.while_loop(
        cond, body, (alpha0, jnp.int32(0), jnp.bool_(False),
                     jnp.float32(jnp.inf)))
    return alpha, iters, mrd, n_degenerate, available


def initial_alphas(num_txps: int, online_mass: Optional[np.ndarray],
                   total_mapped: float, init_uniform: bool = False,
                   num_required_frags: float = 5e7,
                   alt_init: bool = False) -> np.ndarray:
    """Linear blend of online estimates and uniform (reference optimize
    :800-823). alt_init (--alternativeInitMode, also implied by --meta)
    blends with a per-transcript mass of 1.0 instead of the uniform
    prior (:817-818)."""
    if online_mass is None or init_uniform:
        return np.full(num_txps, max(total_mapped, 1.0) / max(num_txps, 1))
    frac = min(0.999, total_mapped / max(num_required_frags, 1.0))
    uniform = 1.0 if alt_init else total_mapped / max(num_txps, 1)
    return online_mass * frac + uniform * (1.0 - frac)


def prior_alphas(num_txps: int, eff_lens: np.ndarray, prior_value: float,
                 per_transcript: bool) -> np.ndarray:
    """Reference populatePriorAlphas_ (:82-99)."""
    if per_transcript:
        return np.full(num_txps, prior_value)
    return prior_value * eff_lens


# entry-count threshold above which the sort-routed engine takes over
# (gather-free iterations ~8x faster at human scale; below this the
# classic path compiles faster and the gap doesn't matter)
ROUTED_MIN_ENTRIES = 65_536


def optimize(eq: PackedEqClasses, num_txps: int, eff_lens: np.ndarray,
             online_mass: Optional[np.ndarray] = None,
             total_mapped: Optional[float] = None,
             config: EMConfig = EMConfig(),
             init_uniform: bool = False,
             engine: str = "auto",
             num_required_frags: float = 5e7,
             alt_init: bool = False) -> dict:
    """Host-facing optimize: packs, runs the jitted loop, truncates.

    engine: 'auto' (sort-routed above ROUTED_MIN_ENTRIES), 'routed',
    or 'xla' (classic gather/segment_sum path).
    Returns dict with alphas (est. read counts), iterations, converged.
    """
    if total_mapped is None:
        total_mapped = eq.num_fragments
    use_routed = (engine == "routed"
                  or (engine == "auto"
                      and eq.labels.shape[0] >= ROUTED_MIN_ENTRIES))
    if use_routed:
        from salmon_tpu.inference import fastem
        a0 = initial_alphas(num_txps, online_mass, total_mapped,
                            init_uniform, num_required_frags, alt_init)
        pri = prior_alphas(num_txps, eff_lens, config.vb_prior,
                           config.per_transcript_prior)
        res = fastem.optimize_routed(
            eq, num_txps, eff_lens, a0, pri, config.use_vbem,
            config.rel_diff_tolerance, config.min_iterations,
            config.max_iterations,
            alpha_cutoff=config.alpha_check_cutoff)
        res["alphas"][res["alphas"] < config.min_alpha] = 0.0
        res.pop("packed", None)
        return res

    eqd, (E, Cl, Ep, Clp) = pad_eqclasses(eq)
    a0 = initial_alphas(num_txps, online_mass, total_mapped, init_uniform,
                        num_required_frags, alt_init)
    pri = prior_alphas(num_txps, eff_lens, config.vb_prior,
                       config.per_transcript_prior)
    alpha, iters, mrd, n_degen, available = run_em(
        eqd, jnp.asarray(a0, jnp.float32), jnp.asarray(pri, jnp.float32),
        num_txps, config.use_vbem, config.rel_diff_tolerance,
        config.min_iterations, config.max_iterations, 0,
        eff_lens=jnp.asarray(eff_lens, jnp.float32))
    alphas = np.asarray(alpha, dtype=np.float64)
    # truncate tiny values (reference :1004-1014)
    alphas[alphas < config.min_alpha] = 0.0
    return {
        "alphas": alphas,
        "iterations": int(iters),
        "max_rel_diff": float(mrd),
        "converged": float(mrd) <= config.rel_diff_tolerance,
        "num_degenerate_classes": int(n_degen),
        "available": np.asarray(available),
    }


# ---------------------------------------------------------------------------
# float64 numpy reference engine (validation / tiny problems)

def em_numpy(eq: PackedEqClasses, num_txps: int, eff_lens: np.ndarray,
             config: EMConfig = EMConfig(),
             online_mass: Optional[np.ndarray] = None,
             total_mapped: Optional[float] = None) -> dict:
    from scipy.special import digamma  # scipy ships with the jax stack

    if total_mapped is None:
        total_mapped = eq.num_fragments
    seg = np.repeat(np.arange(eq.num_classes), eq.class_sizes)
    el = np.maximum(eff_lens[eq.labels], 1.0)
    w = eq.counts[seg] * eq.weights / el
    wsum = np.bincount(seg, weights=w, minlength=eq.num_classes)
    cw = w / wsum[seg]
    alpha = initial_alphas(num_txps, online_mass, total_mapped)
    # markDegenerateClasses parity
    denom0 = np.bincount(seg, weights=alpha[eq.labels] * cw,
                         minlength=eq.num_classes)
    counts_cls = np.where(denom0 <= MIN_EQ_WEIGHT, 0.0, eq.counts)
    eq = dataclasses.replace(eq, counts=counts_cls)
    pri = prior_alphas(num_txps, eff_lens, config.vb_prior,
                       config.per_transcript_prior)
    singleton = eq.class_sizes[seg] == 1
    it = 0
    converged = False
    while it < config.min_iterations or (
            it < config.max_iterations and not converged):
        if config.use_vbem:
            ap = alpha + pri
            ln = digamma(ap.sum())
            base = np.where(ap > DIGAMMA_MIN, np.exp(digamma(ap) - ln), 0.0)
        else:
            base = alpha
        gamma = base[eq.labels] * cw
        denom = np.bincount(seg, weights=gamma, minlength=eq.num_classes)
        d = denom[seg]
        contrib = np.where(d > MIN_EQ_WEIGHT,
                           eq.counts[seg] * gamma / np.maximum(d, 1e-300),
                           0.0)
        contrib = np.where(singleton, eq.counts[seg], contrib)
        alpha_p = np.bincount(eq.labels, weights=contrib,
                              minlength=num_txps)
        check = alpha_p > config.alpha_check_cutoff
        rel = np.where(check, np.abs(alpha - alpha_p)
                       / np.maximum(alpha_p, 1e-300), 0.0)
        converged = rel.max() <= config.rel_diff_tolerance
        alpha = alpha_p
        it += 1
    alpha = alpha.copy()
    alpha[alpha < config.min_alpha] = 0.0
    return {"alphas": alpha, "iterations": it, "converged": converged,
            "max_rel_diff": float(rel.max())}
