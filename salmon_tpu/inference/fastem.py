"""Sort-routed collapsed EM/VBEM — the TPU fast path at scale.

Reference semantics: src/inference/CollapsedEMOptimizer.cpp EMUpdate_ /
VBEMUpdate_ (:179-328) — identical math to inference.em.run_em.

Why this exists: on this TPU backend, XLA gathers and scatters cost
~8ns/element in EVERY formulation (1-D, row-wise, take_along_axis), so
the classic gather+segment_sum EM iteration costs ~25ms at human scale
(~1M CSR entries, 250k txps). The fast primitives are sorts
(~1ns/element for a full 1-M-element 1-D sort), static strided
reductions, and elementwise ops. This module re-expresses the EM update
with ZERO gathers/scatters:

  * C-layout: entries grouped by equivalence class, classes padded into
    power-of-two width buckets -> per-class denominators are static
    reshape-sums, and the count broadcast is a static repeat.
  * L-layout: entries grouped by transcript, padded likewise -> the
    alpha -> entry multicast is a static repeat, and the new-alpha
    reduction is a static reshape-sum. alpha lives in "region order"
    for the whole loop (converted once at entry/exit).
  * regions are SLOT-MAJOR: a (width w, n items) region stores slot j
    of every item contiguously (flat = pos + j*n + i), so reductions
    are (w, n) sums over axis 0 and broadcasts are (1, n) -> (w, n) —
    the minor dimension is always the large n. (The item-major layout's
    (n, w) reshapes put the tiny width on the minor dim, paying the
    16x lane-padding tax: region ops measured ~1.6 ms/iter of the
    4.0 ms round-4 iteration, probe_em_parts r5.)
  * The two E-sized data movements per iteration (L->C multicast
    delivery and C->L contribution return) are lax.sort by PRECOMPUTED
    permutation keys — the only data-dependent-looking ops, and both
    ride the TPU's fast sorting network.

The layouts and route keys depend only on the eq-class STRUCTURE, so
they are packed once per optimize() call and reused across iterations
(and across bootstrap replicates: counts enter as data).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from salmon_tpu.inference.em import DIGAMMA_MIN, MIN_EQ_WEIGHT


_WIDTH_STEPS = np.array(
    [1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384,
     512, 768, 1024, 1536, 2048, 3072, 4096], np.int64)


def _bucket_widths(sizes: np.ndarray) -> np.ndarray:
    """Smallest 1.5x-graded step >= size (min 1) — padding stays ~12%
    while region ops remain static and cheap."""
    s = np.maximum(sizes.astype(np.int64), 1)
    i = np.searchsorted(_WIDTH_STEPS, s)
    if i.max() >= len(_WIDTH_STEPS):
        # gigantic classes: fall back to pow2
        big = i >= len(_WIDTH_STEPS)
        out = np.empty_like(s)
        out[~big] = _WIDTH_STEPS[i[~big]]
        out[big] = 1 << np.ceil(np.log2(s[big])).astype(np.int64)
        return out
    return _WIDTH_STEPS[i]


@dataclasses.dataclass
class RoutedEq:
    """Static pack of one eq-class structure for the sort-routed EM."""
    # --- static metadata (python ints; part of the jit hash) ---
    num_txps: int
    n_entries: int
    s_c: int                      # C-layout slots
    s_l: int                      # L-layout slots
    n_route: int                  # sort length (>= s_c, s_l)
    c_regions: tuple              # ((width, n_classes), ...) in order
    l_regions: tuple              # ((width, n_txps), ...) in order
    n_absent: int                 # txps with no entries (tail of region order)
    # --- device arrays ---
    key_lc: jax.Array             # (n_route,) uint32 route L->C
    key_cl: jax.Array             # (n_route,) uint32 route C->L
    cw_c: jax.Array               # (s_c,) f32 combined weights (0 on pad)
    aux_c: jax.Array              # (s_c,) f32 raw aux weights (0 on pad)
    inv_el_c: jax.Array           # (s_c,) f32 1/effLen per entry (0 on pad)
    real_c: jax.Array             # (s_c,) bool real-entry slots
    class_of_slot: jax.Array      # (s_c,) int32 region-ordered class index
    counts_region: jax.Array      # (n_classes,) f64->f32 counts, region order
    sizes_region: jax.Array       # (n_classes,) int32 class sizes, region order
    # host-side mappings for order conversion
    txp_order: np.ndarray         # region position -> original txp id
    class_order: np.ndarray       # region position -> original class id


def pack_routed(eq, num_txps: int, eff_lens: np.ndarray) -> RoutedEq:
    """Build the static layouts + route keys from a PackedEqClasses."""
    labels = np.asarray(eq.labels, np.int64)
    E = labels.shape[0]
    sizes = np.asarray(eq.class_sizes, np.int64)
    ncls = sizes.shape[0]
    seg = np.repeat(np.arange(ncls, dtype=np.int64), sizes)

    # combined weights (host, f64): count * aux / effLen, class-normalized
    el = np.maximum(np.asarray(eff_lens, np.float64)[
        np.minimum(labels, len(eff_lens) - 1)], 1.0)
    w = np.asarray(eq.counts, np.float64)[seg] * \
        np.asarray(eq.weights, np.float64) / el
    wsum = np.bincount(seg, weights=w, minlength=ncls)
    cw = np.where(wsum[seg] > 0, w / np.maximum(wsum[seg], 1e-300), 0.0)

    # ---- C-layout: classes bucketed by pow2 width
    cwid = _bucket_widths(sizes)
    c_order = np.argsort(cwid, kind="stable")      # ascending width
    widths_sorted = cwid[c_order]
    uniq_w, w_start = np.unique(widths_sorted, return_index=True)
    c_regions = []
    pos = 0
    # slot-major: class at rank i of an (wv, n) region puts its j-th
    # entry at flat slot pos + j*n + i
    class_base = np.zeros(ncls, np.int64)     # region pos + rank
    class_nreg = np.zeros(ncls, np.int64)     # region n (slot stride)
    for i, wv in enumerate(uniq_w):
        lo = w_start[i]
        hi = w_start[i + 1] if i + 1 < len(uniq_w) else ncls
        n = hi - lo
        class_base[c_order[lo:hi]] = pos + np.arange(n)
        class_nreg[c_order[lo:hi]] = n
        c_regions.append((int(wv), int(n)))
        pos += n * wv
    s_c = int(pos)
    # entry -> C slot
    in_class_pos = np.arange(E) - np.repeat(
        np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes)
    c_slot = class_base[seg] + in_class_pos * class_nreg[seg]

    cw_c = np.zeros(s_c, np.float32)
    cw_c[c_slot] = cw.astype(np.float32)
    # Gibbs planes: raw aux weights, per-entry 1/effLen, real-slot mask
    aux_c = np.zeros(s_c, np.float32)
    aux_c[c_slot] = np.asarray(eq.weights, np.float32)
    inv_el_c = np.zeros(s_c, np.float32)
    inv_el_c[c_slot] = (1.0 / el).astype(np.float32)
    real_c = np.zeros(s_c, bool)
    real_c[c_slot] = True
    # region-ordered class arrays (for counts/sizes broadcast in-graph)
    counts_region = np.asarray(eq.counts, np.float64)[c_order]
    sizes_region = sizes[c_order].astype(np.int32)

    # ---- L-layout: txps bucketed by pow2 entry count
    k_t = np.bincount(labels, minlength=num_txps).astype(np.int64)
    present = np.nonzero(k_t > 0)[0]
    absent = np.nonzero(k_t == 0)[0]
    lwid = _bucket_widths(k_t[present])
    l_order_p = np.argsort(lwid, kind="stable")
    lw_sorted = lwid[l_order_p]
    uniq_lw, lw_start = np.unique(lw_sorted, return_index=True)
    l_regions = []
    pos = 0
    txp_base = np.zeros(num_txps, np.int64)
    txp_nreg = np.zeros(num_txps, np.int64)
    txp_region_pos = np.zeros(num_txps, np.int64)
    for i, wv in enumerate(uniq_lw):
        lo = lw_start[i]
        hi = lw_start[i + 1] if i + 1 < len(uniq_lw) else len(present)
        n = hi - lo
        tids = present[l_order_p[lo:hi]]
        txp_base[tids] = pos + np.arange(n)
        txp_nreg[tids] = n
        txp_region_pos[tids] = (np.sum([r[1] for r in l_regions])
                                + np.arange(n))
        l_regions.append((int(wv), int(n)))
        pos += n * wv
    s_l = int(pos)
    n_present = len(present)
    txp_region_pos[absent] = n_present + np.arange(len(absent))
    txp_order = np.zeros(num_txps, np.int64)
    txp_order[txp_region_pos] = np.arange(num_txps)

    # entry -> L slot (stable order of entries within each txp)
    order_by_label = np.argsort(labels, kind="stable")
    ranks = np.empty(E, np.int64)
    ranks[order_by_label] = np.arange(E)
    # position within txp group = rank - group start
    grp_start = np.zeros(num_txps, np.int64)
    grp_start[1:] = np.cumsum(k_t)[:-1]
    l_slot = txp_base[labels] + (ranks
                                 - grp_start[labels]) * txp_nreg[labels]

    # ---- routes: one uint32 permutation key per direction.
    # Sort semantics: element at input position i lands at output
    # position key[i] (keys are a permutation of 0..N-1). The sort is
    # the per-iteration cost driver, so the length is kept minimal:
    # dst-side padding slots absorb src-side padding; only the excess
    # needs trash positions past the dst region.
    # any n_route >= max(s_l, s_c) balances: non-entry sources always
    # equal non-entry destinations (both are n_route - E)
    n_route = -(-int(max(s_l, s_c) + 8) // 8) * 8

    def build_key(src_slot, dst_slot, s_src, s_dst):
        key = np.full(n_route, -1, np.int64)
        key[src_slot] = dst_slot               # real entries
        # everything else (src padding + tail) fills remaining dst
        # positions (dst padding first, then trash) in order
        free_dst = np.setdiff1d(np.arange(n_route, dtype=np.int64),
                                dst_slot, assume_unique=False)
        key[key < 0] = free_dst[:np.sum(key < 0)]
        return key.astype(np.uint32)

    key_lc = build_key(l_slot, c_slot, s_l, s_c)
    key_cl = build_key(c_slot, l_slot, s_c, s_l)

    return RoutedEq(
        num_txps=num_txps, n_entries=E, s_c=s_c, s_l=s_l,
        n_route=n_route,
        c_regions=tuple(c_regions), l_regions=tuple(l_regions),
        n_absent=len(absent),
        key_lc=jnp.asarray(key_lc), key_cl=jnp.asarray(key_cl),
        cw_c=jnp.asarray(cw_c),
        aux_c=jnp.asarray(aux_c),
        inv_el_c=jnp.asarray(inv_el_c),
        real_c=jnp.asarray(real_c),
        class_of_slot=jnp.asarray(np.zeros(1, np.int32)),  # unused
        counts_region=jnp.asarray(counts_region, jnp.float32),
        sizes_region=jnp.asarray(sizes_region),
        txp_order=txp_order,
        class_order=c_order,
    )


def _route(key, x, n_route):
    """Apply the static permutation: element i -> position key[i]."""
    pad = n_route - x.shape[0]
    xi = jnp.concatenate([x, jnp.zeros(pad, x.dtype)]) if pad else x
    _, out = jax.lax.sort((key, xi), dimension=0, num_keys=1,
                          is_stable=False)
    return out


def _region_slices(regions):
    out = []
    pos = 0
    for wv, n in regions:
        out.append((pos, wv, n))
        pos += wv * n
    return out


def _expand_regions(vec_region, regions):
    """(n_items,) region-ordered -> (slots,) with each item repeated by
    its region width (static, slot-major: minor dim stays n)."""
    parts = []
    ipos = 0
    for wv, n in regions:
        seg = jax.lax.dynamic_slice_in_dim(vec_region, ipos, n)
        parts.append(jnp.broadcast_to(seg[None, :], (wv, n))
                     .reshape(-1))
        ipos += n
    return jnp.concatenate(parts)


def _reduce_regions(slots_vec, regions):
    """(slots,) -> per-item sums (n_items,) region-ordered (static,
    slot-major: the (wv, n) sum reduces over sublanes)."""
    parts = []
    for pos, wv, n in _region_slices(regions):
        seg = jax.lax.dynamic_slice_in_dim(slots_vec, pos, wv * n)
        parts.append(seg.reshape(wv, n).sum(axis=0))
    return jnp.concatenate(parts)


# iterations per compiled chunk: the host loop re-invokes ONE compiled
# fixed-trip fori program and checks convergence between chunks. A
# device-side while_loop pays heavy per-iteration overhead on this
# backend, and giving fori the full max_iter trip count compiles a
# separate (and, observed at trip counts >= 200, pathologically
# scheduled) executable per requested count; 100-iteration chunks keep
# one cached executable, amortize the per-chunk readback to ~0.25
# ms/iter, and bound convergence overshoot at 99 extra iterations
# (the reference checks every iteration,
# CollapsedEMOptimizer.cpp:945-957; overshoot only tightens the
# fixpoint).
EM_CHUNK = 100


@functools.partial(jax.jit, static_argnums=(0, 5, 6))
def _em_chunk(static: tuple, arrays: dict, alpha_r, prior_r,
              counts_slots, use_vbem: bool, n_steps: int):
    """Run `n_steps` EM/VBEM iterations; returns (alpha, mrd of last)."""
    (num_txps, s_c, s_l, n_route, c_regions, l_regions, n_absent,
     alpha_cutoff) = static
    key_lc = arrays["key_lc"]
    key_cl = arrays["key_cl"]
    cw_c = arrays["cw_c"]
    sizes_region = arrays["sizes_region"]
    n_present = num_txps - n_absent

    singleton_slots = _expand_regions(
        (sizes_region == 1).astype(jnp.float32), c_regions)

    def multicast(base_region):
        """alpha-like (T,) region order -> gamma surface (s_c,)."""
        base_l = _expand_regions(base_region[:n_present], l_regions)
        base_c = _route(key_lc, base_l, n_route)[:s_c]
        return base_c * cw_c

    def class_denoms(gamma):
        d = _reduce_regions(gamma, c_regions)          # per class
        return _expand_regions(d, c_regions)           # back to slots

    def contrib_to_alpha(contrib_c):
        back = _route(key_cl, contrib_c, n_route)[:s_l]
        alpha_p = _reduce_regions(back, l_regions)     # present txps
        return jnp.concatenate(
            [alpha_p, jnp.zeros(n_absent, jnp.float32)])

    if use_vbem:
        prior_all = prior_r

        def base_fn(a):
            ap = a + prior_all
            log_norm = jax.scipy.special.digamma(jnp.sum(ap))
            return jnp.where(
                ap > DIGAMMA_MIN,
                jnp.exp(jax.scipy.special.digamma(
                    jnp.maximum(ap, DIGAMMA_MIN)) - log_norm), 0.0)
    else:
        base_fn = lambda a: a

    def step(alpha):
        gamma = multicast(base_fn(alpha))
        d = class_denoms(gamma)
        contrib = jnp.where(d > MIN_EQ_WEIGHT,
                            counts_slots * gamma
                            / jnp.maximum(d, MIN_EQ_WEIGHT), 0.0)
        # singleton classes always get their full count (:225-227);
        # cw_c > 0 marks the real (non-padding) slot of the class
        contrib = jnp.where((singleton_slots > 0) & (cw_c > 0),
                            counts_slots, contrib)
        return contrib_to_alpha(contrib)

    def body(i, state):
        alpha, _ = state
        alpha_p = step(alpha)
        check = alpha_p > alpha_cutoff
        rel = jnp.where(check, jnp.abs(alpha - alpha_p)
                        / jnp.maximum(alpha_p, 1e-30), 0.0)
        return alpha_p, jnp.max(rel)

    return jax.lax.fori_loop(0, n_steps, body,
                             (alpha_r, jnp.float32(jnp.inf)))


@functools.partial(jax.jit, static_argnums=(0,))
def _em_init(static: tuple, arrays: dict, alpha0_r, counts_region):
    """markDegenerateClasses (reference :331-394) using alpha0: classes
    whose members carry ~zero combined weight are excluded (count 0).
    Returns (counts_slots, n_degenerate)."""
    (num_txps, s_c, s_l, n_route, c_regions, l_regions, n_absent,
     _alpha_cutoff) = static
    n_present = num_txps - n_absent
    base_l = _expand_regions(alpha0_r[:n_present], l_regions)
    gamma0 = _route(arrays["key_lc"], base_l, n_route)[:s_c] \
        * arrays["cw_c"]
    den0 = _reduce_regions(gamma0, c_regions)
    degenerate = den0 <= MIN_EQ_WEIGHT
    n_degen = jnp.sum(degenerate.astype(jnp.int32))
    counts_eff = jnp.where(degenerate, 0.0, counts_region)
    return _expand_regions(counts_eff, c_regions), n_degen


def optimize_routed(eq, num_txps: int, eff_lens: np.ndarray,
                    alpha0: np.ndarray, prior: np.ndarray,
                    use_vbem: bool, tol: float, min_iter: int,
                    max_iter: int, alpha_cutoff: float = 1e-2,
                    packed: Optional[RoutedEq] = None):
    """Host driver: pack (or reuse), run chunked, un-permute.

    The loop runs EM_CHUNK fixed-trip iterations per device call and
    checks convergence between chunks (one scalar readback each) — the
    reference checks every iteration (CollapsedEMOptimizer.cpp:945-957),
    so a converged run here may overshoot by up to EM_CHUNK-1 extra
    iterations, which only tightens the fixpoint. Returns dict."""
    if packed is None:
        packed = pack_routed(eq, num_txps, eff_lens)
    r = packed
    inv = np.empty(num_txps, np.int64)
    inv[r.txp_order] = np.arange(num_txps)   # txp id -> region position
    static = (r.num_txps, r.s_c, r.s_l, r.n_route, r.c_regions,
              r.l_regions, r.n_absent, float(alpha_cutoff))
    arrays = {"key_lc": r.key_lc, "key_cl": r.key_cl, "cw_c": r.cw_c,
              "sizes_region": r.sizes_region}
    alpha = jnp.asarray(alpha0[r.txp_order], jnp.float32)
    prior_r = jnp.asarray(prior[r.txp_order], jnp.float32)
    counts_slots, n_degen = _em_init(static, arrays, alpha,
                                     r.counts_region)
    iters = 0
    mrd = float("inf")
    while iters < max_iter:
        n = min(EM_CHUNK, max_iter - iters)
        alpha, mrd_dev = _em_chunk(static, arrays, alpha, prior_r,
                                   counts_slots, use_vbem, n)
        iters += n
        mrd = float(mrd_dev)
        if iters >= min_iter and mrd <= tol:
            break
    out = np.asarray(alpha, np.float64)[inv]
    return {"alphas": out, "iterations": int(iters),
            "max_rel_diff": mrd,
            "converged": mrd <= tol,
            "num_degenerate_classes": int(n_degen),
            "packed": packed}
