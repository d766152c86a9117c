"""Posterior sampling: Gibbs chains and bootstrap replicates.

Reference: src/inference/CollapsedGibbsSampler.cpp (Turro-style
non-collapsed sampler, sampleRoundNonCollapsedMultithreaded_ :93-180,
sample :318-520) and CollapsedEMOptimizer.cpp doBootstrap (:398-530) /
gatherBootstraps (:555-689).

TPU design: equivalence classes are padded to a dense (C, S) member matrix
(S = max class size, bounded by the mapper's T2 cap). A multinomial
redistribution of each class's count over its members is computed for ALL
classes at once with a conditional-binomial scan over the S member slots
(each step: one vectorized jax.random.binomial draw). Gibbs chains run as
a lax.scan over samples (thinningFactor internal rounds each); bootstrap
replicates vmap over the same dense update (SURVEY.md §2.11 item 6).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

from salmon_tpu.constants import DEFAULTS
from salmon_tpu.inference.em import MIN_EQ_WEIGHT, DIGAMMA_MIN
from salmon_tpu.inference.eqclasses import PackedEqClasses

GIBBS_BETA = 0.1  # reference: beta in sampleRoundNonCollapsedMultithreaded_

# per-class count cap for the device multinomial: the conditional-
# binomial scan carries its running remainder in float32, which is
# exact for integers <= 2^24. Classes deeper than this are split into
# equal-distribution chunks (Multinomial(n1+n2, p) = Multinomial(n1, p)
# + Multinomial(n2, p)), keeping every device-side count exactly
# representable at any fragment scale.
MULTINOMIAL_COUNT_CAP = 1 << 23


def split_deep_classes(eq: PackedEqClasses,
                       cap: int = MULTINOMIAL_COUNT_CAP) -> PackedEqClasses:
    """Split classes with count > cap into chunks of <= cap fragments.

    The chunked multinomial reassignment has exactly the original
    distribution, so sampling semantics are unchanged; only the f32
    precision bound moves out of reach (>2^24-count classes would lose
    integer precision in the device redistribution otherwise)."""
    deep = np.flatnonzero(eq.counts > cap)
    if deep.size == 0:
        return eq
    label_chunks, weight_chunks = [], []
    counts, sizes = [], []
    for j in range(eq.num_classes):
        lo, hi = int(eq.offsets[j]), int(eq.offsets[j + 1])
        n = float(eq.counts[j])
        reps = max(1, int(np.ceil(n / cap)))
        for r in range(reps):
            label_chunks.append(eq.labels[lo:hi])
            weight_chunks.append(eq.weights[lo:hi])
            counts.append(min(float(cap), n - r * cap))
            sizes.append(hi - lo)
    labels = np.concatenate(label_chunks).astype(np.int32)
    weights = np.concatenate(weight_chunks)
    sizes = np.asarray(sizes, np.int32)
    offsets = np.zeros(sizes.shape[0] + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    return PackedEqClasses(labels=labels, weights=weights,
                           offsets=offsets,
                           counts=np.asarray(counts, np.float64),
                           class_sizes=sizes)


def _nchains(num_samples: int) -> int:
    """Chain count keyed off the sample budget (reference sample
    :425-437)."""
    if num_samples >= 200:
        return 8
    if num_samples >= 100:
        return 4
    if num_samples >= 50:
        return 2
    return 1


def dense_classes(eq: PackedEqClasses, num_txps: int):
    """Pad CSR classes to dense (C, S) numpy arrays.

    Returns dict with labels (C, S) int32, aux (C, S) f32 (class-normalized
    aux weights), mask (C, S) bool, counts (C,) f32.
    """
    C = eq.num_classes
    S = max(1, int(eq.class_sizes.max())) if C else 1
    labels = np.zeros((C, S), dtype=np.int32)
    aux = np.zeros((C, S), dtype=np.float32)
    mask = np.zeros((C, S), dtype=bool)
    for j in range(C):
        lo, hi = eq.offsets[j], eq.offsets[j + 1]
        n = hi - lo
        labels[j, :n] = eq.labels[lo:hi]
        aux[j, :n] = eq.weights[lo:hi]
        mask[j, :n] = True
    return {
        "labels": jnp.asarray(labels),
        "aux": jnp.asarray(aux),
        "mask": jnp.asarray(mask),
        "counts": jnp.asarray(eq.counts.astype(np.float32)),
    }, S


def multinomial_rows(key, n, probs, mask):
    """Draw Multinomial(n_j, probs_j) for every row j at once.

    Conditional-binomial method: slot i gets
    Binomial(remaining_j, p_i / tail_p_j). probs need not be normalized.
    n: (C,) float counts; probs/mask: (C, S). Returns (C, S) float32.

    Precision bound: the running remainder is float32, so a single ROW
    with n > 2^24 (~16.7M fragments in one equivalence class) loses
    integer precision in the redistribution. Bootstrap TOTALS are exact
    (resampled on the host); this bound applies to Gibbs reassignment
    of pathologically deep single classes only.
    """
    C, S = probs.shape
    p = jnp.where(mask, probs, 0.0)
    tail = jnp.cumsum(p[:, ::-1], axis=1)[:, ::-1]  # sum of p[:, i:]

    def body(i, carry):
        remaining, out, key = carry
        key, sub = jax.random.split(key)
        pi = p[:, i]
        ti = tail[:, i]
        frac = jnp.where(ti > MIN_EQ_WEIGHT, pi / jnp.maximum(ti, 1e-30),
                         1.0)
        frac = jnp.clip(frac, 0.0, 1.0)
        is_last = (i == S - 1) | (ti - pi <= MIN_EQ_WEIGHT)
        draw = jax.random.binomial(sub, remaining.astype(jnp.float32),
                                   frac).astype(jnp.float32)
        draw = jnp.where(is_last, remaining, draw)
        draw = jnp.where(mask[:, i], draw, 0.0)
        out = out.at[:, i].set(draw)
        remaining = remaining - draw
        return remaining, out, key

    remaining0 = n.astype(jnp.float32)
    out0 = jnp.zeros((C, S), jnp.float32)
    _, out, _ = jax.lax.fori_loop(0, S, body, (remaining0, out0, key))
    return out


def multinomial_cols(key, n, probs_t, mask_t):
    """multinomial_rows with slots on axis 0: probs_t/mask_t are (S, C)
    and the result is (S, C). Matches the slot-major routed-EM region
    layout (fastem) — row ops keep the large C on the minor dim, where
    the (C, small-S) form paid the lane-padding tax."""
    S, C = probs_t.shape
    p = jnp.where(mask_t, probs_t, 0.0)
    tail = jnp.cumsum(p[::-1, :], axis=0)[::-1, :]   # sum of p[i:, :]

    def body(i, carry):
        remaining, out, key = carry
        key, sub = jax.random.split(key)
        pi = p[i]
        ti = tail[i]
        frac = jnp.where(ti > MIN_EQ_WEIGHT, pi / jnp.maximum(ti, 1e-30),
                         1.0)
        frac = jnp.clip(frac, 0.0, 1.0)
        is_last = (i == S - 1) | (ti - pi <= MIN_EQ_WEIGHT)
        draw = jax.random.binomial(sub, remaining.astype(jnp.float32),
                                   frac).astype(jnp.float32)
        draw = jnp.where(is_last, remaining, draw)
        draw = jnp.where(mask_t[i], draw, 0.0)
        out = out.at[i].set(draw)
        remaining = remaining - draw
        return remaining, out, key

    remaining0 = n.astype(jnp.float32)
    out0 = jnp.zeros((S, C), jnp.float32)
    _, out, _ = jax.lax.fori_loop(0, S, body, (remaining0, out0, key))
    return out


def _gibbs_round(key, txp_count, dcls, prior, eff_lens, num_txps: int,
                 no_gamma_draw: bool):
    """One internal Gibbs round: mu draw + multinomial reassignment.

    txp_count is carried as int32 (draws are integral; int32 keeps
    per-transcript totals exact past the f32 2^24 bound)."""
    k_mu, k_mult = jax.random.split(key)
    ci = txp_count.astype(jnp.float32) + prior
    if no_gamma_draw:
        mu = ci / jnp.maximum(eff_lens, 1.0)
    else:
        # Gamma(ci, scale=1/(beta + effLen))
        g = jax.random.gamma(k_mu, jnp.maximum(ci, 1e-6))
        mu = g / (GIBBS_BETA + eff_lens)

    probs = (1000.0 * jnp.take(mu, dcls["labels"], mode="clip")
             * dcls["aux"])
    # degenerate-denominator fallbacks (reference :103-130): 1/effLen, then
    # uniform
    denom = jnp.sum(jnp.where(dcls["mask"], probs, 0.0), axis=1,
                    keepdims=True)
    el_fallback = 1.0 / jnp.maximum(
        jnp.take(eff_lens, dcls["labels"], mode="clip"), 1.0)
    probs = jnp.where(denom > MIN_EQ_WEIGHT, probs, el_fallback)
    denom2 = jnp.sum(jnp.where(dcls["mask"], probs, 0.0), axis=1,
                     keepdims=True)
    probs = jnp.where(denom2 > MIN_EQ_WEIGHT, probs,
                      jnp.ones_like(probs))

    assign = multinomial_rows(k_mult, dcls["counts"], probs, dcls["mask"])
    flat_labels = dcls["labels"].reshape(-1)
    # draws are exact integers <= MULTINOMIAL_COUNT_CAP in f32; sum them
    # in int32 so deep transcripts stay exact past 2^24
    flat_assign = jnp.where(dcls["mask"], assign, 0.0).reshape(-1)
    return jax.ops.segment_sum(flat_assign.astype(jnp.int32), flat_labels,
                               num_segments=num_txps)


def gibbs_samples(eq: PackedEqClasses, num_txps: int, eff_lens: np.ndarray,
                  init_counts: np.ndarray, num_samples: int,
                  thinning: int = DEFAULTS.thinning_factor,
                  prior: np.ndarray | float = 1e-3,
                  no_gamma_draw: bool = False,
                  seed: int = 271828) -> np.ndarray:
    """Generate `num_samples` posterior count draws.

    Multiple chains restart from the initial EM estimate exactly as the
    reference (nchains keyed off numSamples, sample :425-437). Returns
    (num_samples, num_txps) float64 integer counts (exact at any depth:
    deep classes are chunked and totals accumulate in int32).
    """
    eq = split_deep_classes(eq)
    dcls, S = dense_classes(eq, num_txps)
    eff = jnp.asarray(np.maximum(eff_lens, 1.0), jnp.float32)
    pri = jnp.asarray(np.broadcast_to(np.asarray(prior, np.float64),
                                      (num_txps,)), jnp.float32)
    # the carry becomes integral after the first reassignment round;
    # rounding the (fractional) EM seed only perturbs the first mu draw
    init = jnp.asarray(np.rint(np.asarray(init_counts)), jnp.int32)

    nchains = _nchains(num_samples)
    per_chain = -(-num_samples // nchains)

    @jax.jit
    def one_chain(key):
        def sample_step(carry, _):
            txp_count, key = carry
            def thin_round(i, c):
                tc, k = c
                k, sub = jax.random.split(k)
                return _gibbs_round(sub, tc, dcls, pri, eff, num_txps,
                                    no_gamma_draw), k
            txp_count, key = jax.lax.fori_loop(
                0, thinning, thin_round, (txp_count, key))
            return (txp_count, key), txp_count
        (_, _), samples = jax.lax.scan(
            sample_step, (init, key), None, length=per_chain)
        return samples

    keys = jax.random.split(jax.random.PRNGKey(seed), nchains)
    all_s = jax.vmap(one_chain)(keys)  # (nchains, per_chain, T)
    out = np.asarray(all_s).reshape(-1, num_txps)[:num_samples]
    return out.astype(np.float64)


def gibbs_samples_routed(eq: PackedEqClasses, num_txps: int,
                         eff_lens: np.ndarray, init_counts: np.ndarray,
                         num_samples: int,
                         thinning: int = DEFAULTS.thinning_factor,
                         prior: np.ndarray | float = 1e-3,
                         no_gamma_draw: bool = False,
                         seed: int = 271828) -> np.ndarray:
    """Gibbs sampling over the sort-routed layout — the at-scale path.

    Same semantics as gibbs_samples (mu Gamma draws + per-class
    multinomial reassignment, reference CollapsedGibbsSampler), but the
    per-round data movement is the two route sorts of the routed EM
    instead of dense (C, maxW) gathers, and the per-class multinomials
    run region-wise ((n, w) rows of equal width — singleton regions
    need no sampling at all)."""
    from salmon_tpu.inference import fastem

    eq = split_deep_classes(eq)
    r = fastem.pack_routed(eq, num_txps, eff_lens)
    n_present = num_txps - r.n_absent
    eff_r = jnp.asarray(np.maximum(np.asarray(eff_lens), 1.0)
                        [r.txp_order], jnp.float32)
    pri_r = jnp.asarray(np.broadcast_to(
        np.asarray(prior, np.float64), (num_txps,))[r.txp_order],
        jnp.float32)
    init_r = jnp.asarray(np.rint(np.asarray(init_counts))[r.txp_order],
                         jnp.int32)
    counts_region = jnp.asarray(r.counts_region, jnp.float32)
    c_slices = []
    pos = 0
    cpos = 0
    for wv, n in r.c_regions:
        c_slices.append((pos, wv, n, cpos))
        pos += wv * n
        cpos += n

    def one_round(key, txp_count_r):
        k_mu, k_mult = jax.random.split(key)
        ci = txp_count_r.astype(jnp.float32) + pri_r
        if no_gamma_draw:
            mu = ci / eff_r
        else:
            g = jax.random.gamma(k_mu, jnp.maximum(ci, 1e-6))
            mu = g / (GIBBS_BETA + eff_r)
        base_l = fastem._expand_regions(mu[:n_present], r.l_regions)
        mu_c = fastem._route(r.key_lc, base_l, r.n_route)[:r.s_c]
        probs = 1000.0 * mu_c * r.aux_c
        # degenerate-denominator fallbacks (reference :103-130)
        denom = fastem._expand_regions(
            fastem._reduce_regions(probs, r.c_regions), r.c_regions)
        probs = jnp.where(denom > MIN_EQ_WEIGHT, probs, r.inv_el_c)
        denom2 = fastem._expand_regions(
            fastem._reduce_regions(probs, r.c_regions), r.c_regions)
        probs = jnp.where(denom2 > MIN_EQ_WEIGHT, probs,
                          r.real_c.astype(jnp.float32))
        # region-wise per-class multinomial reassignment
        parts = []
        keys = jax.random.split(k_mult, len(c_slices))
        for kk, (p0, wv, n, c0) in zip(keys, c_slices):
            cnt = jax.lax.dynamic_slice_in_dim(counts_region, c0, n)
            if wv == 1:
                parts.append(cnt)  # singleton classes: full count
                continue
            # slot-major region: (wv, n), slots on axis 0 (fastem)
            pr = jax.lax.dynamic_slice_in_dim(
                probs, p0, wv * n).reshape(wv, n)
            msk = jax.lax.dynamic_slice_in_dim(
                r.real_c, p0, wv * n).reshape(wv, n)
            parts.append(multinomial_cols(kk, cnt, pr, msk).reshape(-1))
        # draws are exact integers <= MULTINOMIAL_COUNT_CAP in f32;
        # route + reduce them in int32 so deep transcripts stay exact
        assign_c = jnp.concatenate(parts).astype(jnp.int32)
        back = fastem._route(r.key_cl, assign_c, r.n_route)[:r.s_l]
        cnt_p = fastem._reduce_regions(back, r.l_regions)
        return jnp.concatenate(
            [cnt_p, jnp.zeros(r.n_absent, jnp.int32)])

    nchains = _nchains(num_samples)
    per_chain = -(-num_samples // nchains)

    @jax.jit
    def one_chain(key):
        def sample_step(carry, _):
            tc, key = carry
            def thin_round(i, c):
                t, k = c
                k, sub = jax.random.split(k)
                return one_round(sub, t), k
            tc, key = jax.lax.fori_loop(0, thinning, thin_round,
                                        (tc, key))
            return (tc, key), tc
        (_, _), samples = jax.lax.scan(
            sample_step, (init_r, key), None, length=per_chain)
        return samples

    keys = jax.random.split(jax.random.PRNGKey(seed), nchains)
    all_s = np.asarray(jax.vmap(one_chain)(keys)).reshape(-1, num_txps)
    inv = np.empty(num_txps, np.int64)
    inv[r.txp_order] = np.arange(num_txps)
    return all_s[:num_samples][:, inv].astype(np.float64)


def bootstrap_samples(eq: PackedEqClasses, num_txps: int,
                      eff_lens: np.ndarray, num_boot: int,
                      use_vbem: bool, vb_prior: float,
                      per_transcript_prior: bool,
                      active_mask: np.ndarray | None = None,
                      reproject: bool = False,
                      tol: float = DEFAULTS.relative_diff_tolerance,
                      max_iter: int = DEFAULTS.max_em_iterations,
                      seed: int = 271828) -> np.ndarray:
    """Bootstrap replicates: multinomial resample of class counts, then an
    independent EM/VBEM per replicate (vmapped).

    Returns (num_boot, num_txps) float64 counts.
    """
    from salmon_tpu.inference import em as em_mod

    dcls, S = dense_classes(eq, num_txps)
    eff = jnp.asarray(np.maximum(eff_lens, 1.0), jnp.float32)
    total = float(eq.counts.sum())
    C = eq.num_classes
    pri = jnp.asarray(em_mod.prior_alphas(
        num_txps, np.asarray(eff_lens), vb_prior, per_transcript_prior),
        jnp.float32)
    if active_mask is None:
        active = np.zeros(num_txps, dtype=bool)
        active[eq.labels] = True
    else:
        active = active_mask
    uniform = float(1.0 / max(1, active.sum()))
    alpha0 = jnp.asarray(np.where(active, uniform * total, 0.0),
                         jnp.float32)
    active_j = jnp.asarray(active)

    # dense-form combined weights: count * aux / effLen, class-normalized
    el = jnp.maximum(jnp.take(eff, dcls["labels"], mode="clip"), 1.0)
    cw = jnp.where(dcls["mask"], dcls["aux"] / el, 0.0)
    cw_sum = jnp.sum(cw, axis=1, keepdims=True)
    cw = jnp.where(cw_sum > 0, cw / jnp.maximum(cw_sum, 1e-30), 0.0)
    is_singleton = jnp.sum(dcls["mask"], axis=1, keepdims=True) == 1

    def dense_update(alpha, counts):
        base = alpha
        if use_vbem:
            ap = alpha + pri
            log_norm = jax.scipy.special.digamma(jnp.sum(ap))
            base = jnp.where(
                ap > DIGAMMA_MIN,
                jnp.exp(jax.scipy.special.digamma(
                    jnp.maximum(ap, DIGAMMA_MIN)) - log_norm), 0.0)
            base = jnp.where(active_j, base, 0.0)
        gamma = jnp.take(base, dcls["labels"], mode="clip") * cw
        gamma = jnp.where(dcls["mask"], gamma, 0.0)
        denom = jnp.sum(gamma, axis=1, keepdims=True)
        contrib = jnp.where(denom > MIN_EQ_WEIGHT,
                            counts[:, None] * gamma
                            / jnp.maximum(denom, MIN_EQ_WEIGHT), 0.0)
        contrib = jnp.where(is_singleton & dcls["mask"],
                            counts[:, None], contrib)
        return jax.ops.segment_sum(
            jnp.where(dcls["mask"], contrib, 0.0).reshape(-1),
            dcls["labels"].reshape(-1), num_segments=num_txps)

    min_iter = 50
    cutoff = DEFAULTS.alpha_check_cutoff

    # multinomial resample over classes on the HOST (reference csamp
    # over sampleWeights = class counts): exact integer counts (the
    # device conditional-binomial path would carry the running total in
    # float32, drifting past 2^24 fragments) and no C-step sequential
    # loop per replicate
    rng_h = np.random.default_rng(seed ^ 0x5A17)
    base_counts = np.asarray(eq.counts, np.float64)
    pvec = base_counts / max(base_counts.sum(), 1e-300)
    counts_all = jnp.asarray(rng_h.multinomial(
        max(1, int(round(total))), pvec, size=num_boot), jnp.float32)

    @jax.jit
    def one_replicate(counts):
        def cond(state):
            _, it, converged = state
            return (it < min_iter) | ((it < max_iter) & ~converged)

        def body(state):
            alpha, it, _ = state
            alpha_p = dense_update(alpha, counts)
            check = alpha_p > cutoff
            rel = jnp.where(check, jnp.abs(alpha - alpha_p)
                            / jnp.maximum(alpha_p, 1e-30), 0.0)
            return alpha_p, it + 1, jnp.max(rel) <= tol

        alpha, _, _ = jax.lax.while_loop(
            cond, body, (alpha0, jnp.int32(0), jnp.bool_(False)))
        if reproject:
            alpha = dense_update(alpha, dcls["counts"])
        alpha = jnp.where(alpha < DEFAULTS.min_alpha, 0.0, alpha)
        return alpha

    out = jax.vmap(one_replicate)(counts_all)
    return np.asarray(out, dtype=np.float64)


def bootstrap_samples_routed(eq: PackedEqClasses, num_txps: int,
                             eff_lens: np.ndarray, num_boot: int,
                             use_vbem: bool, vb_prior: float,
                             per_transcript_prior: bool,
                             active_mask: np.ndarray | None = None,
                             reproject: bool = False,
                             tol: float = DEFAULTS.relative_diff_tolerance,
                             max_iter: int = DEFAULTS.max_em_iterations,
                             seed: int = 271828) -> np.ndarray:
    """Bootstrap replicates over the sort-routed EM engine — the
    at-scale path (inference.fastem): the eq structure is packed ONCE
    (layouts + route keys depend only on the class structure) and the
    resampled class counts enter as data; replicates run as one
    vmapped chunked program (batched 1-D route sorts).

    Semantics match bootstrap_samples (reference: multinomial resample
    of class counts + independent optimization per replicate,
    CollapsedEMOptimizer gatherBootstraps)."""
    from salmon_tpu.inference import em as em_mod
    from salmon_tpu.inference import fastem

    eq = split_deep_classes(eq)
    r = fastem.pack_routed(eq, num_txps, eff_lens)
    total = float(eq.counts.sum())
    if active_mask is None:
        active = np.zeros(num_txps, dtype=bool)
        active[eq.labels] = True
    else:
        active = active_mask
    uniform = float(total / max(1, active.sum()))
    alpha0 = np.where(active, uniform, 0.0)[r.txp_order]
    prior_r = jnp.asarray(em_mod.prior_alphas(
        num_txps, np.asarray(eff_lens), vb_prior,
        per_transcript_prior)[r.txp_order], jnp.float32)

    # multinomial resample over classes, in region order (host rng —
    # reproducible; counts are data to the packed program)
    rng = np.random.default_rng(seed ^ 0x5A17)
    base = np.asarray(r.counts_region, np.float64)
    p = base / max(base.sum(), 1e-300)
    counts_b = rng.multinomial(
        max(1, int(round(total))), p, size=num_boot).astype(np.float32)

    static = (r.num_txps, r.s_c, r.s_l, r.n_route, r.c_regions,
              r.l_regions, r.n_absent,
              float(DEFAULTS.alpha_check_cutoff))
    arrays = {"key_lc": r.key_lc, "key_cl": r.key_cl, "cw_c": r.cw_c,
              "sizes_region": r.sizes_region}

    expand = jax.jit(functools.partial(
        fastem._expand_regions, regions=r.c_regions))
    counts_slots_b = jax.vmap(expand)(jnp.asarray(counts_b))

    def chunk_one(alpha, counts_slots, n):
        return fastem._em_chunk(static, arrays, alpha, prior_r,
                                counts_slots, use_vbem, n)

    alpha = jnp.broadcast_to(jnp.asarray(alpha0, jnp.float32),
                             (num_boot, num_txps))
    min_iter = 50
    iters = 0
    while iters < max_iter:
        n = min(fastem.EM_CHUNK, max_iter - iters)
        alpha, mrd = jax.vmap(chunk_one, in_axes=(0, 0, None))(
            alpha, counts_slots_b, n)
        iters += n
        if iters >= min_iter and float(jnp.max(mrd)) <= tol:
            break
    if reproject:
        # one update against the ORIGINAL counts (--bootstrapReproject)
        orig_slots = jnp.broadcast_to(
            expand(jnp.asarray(base, jnp.float32)),
            (num_boot, r.s_c))
        alpha, _ = jax.vmap(chunk_one, in_axes=(0, 0, None))(
            alpha, orig_slots, 1)
    out = np.asarray(alpha, np.float64)[:, :]
    inv = np.empty(num_txps, np.int64)
    inv[r.txp_order] = np.arange(num_txps)
    out = out[:, inv]
    out[out < DEFAULTS.min_alpha] = 0.0
    return out
