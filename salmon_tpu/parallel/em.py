"""Eq-class-sharded collapsed EM/VBEM across a device mesh.

The reference's offline EM parallelizes with a TBB task_arena over
equivalence classes (SURVEY.md §2.11 item 5,
src/inference/CollapsedEMOptimizer.cpp:187-233). Here the CSR entry arrays
are sharded over devices along the entries axis; each iteration:

  1. every device computes per-class partial denominators from its local
     entries with a segment_sum over GLOBAL class ids,
  2. `psum` over the mesh completes the per-class denominators (classes may
     straddle shard boundaries — the psum makes that irrelevant),
  3. each device scatters its entries' contributions into a full-size alpha
     vector; a second `psum` yields the replicated new alphas.

Two (n_classes,)+(n_txps,) psums per iteration ride ICI; everything else is
local VPU work. alpha stays replicated (it is small: one float per
transcript).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from salmon_tpu.constants import DEFAULTS
from salmon_tpu.inference.em import DIGAMMA_MIN, MIN_EQ_WEIGHT

ENTRIES_AXIS = "reads"  # reuse the mesh's single data axis


def _local_combined_weights(eqd, eff_lens, n_classes):
    el = jnp.maximum(jnp.take(eff_lens, eqd["labels"], mode="clip"), 1.0)
    w = jnp.take(eqd["counts"], eqd["seg"], mode="clip") * eqd["aux"] / el
    w = jnp.where(eqd["seg"] < n_classes, w, 0.0)
    wsum = jax.ops.segment_sum(w, eqd["seg"], num_segments=n_classes + 1)
    wsum = jax.lax.psum(wsum, ENTRIES_AXIS)
    denom = jnp.take(wsum, eqd["seg"], mode="clip")
    return jnp.where(denom > 0, w / denom, 0.0)


def _sharded_update(alpha, cw, eqd, num_txps, n_classes, exptheta_fn):
    base = alpha if exptheta_fn is None else exptheta_fn(alpha)
    gamma = jnp.take(base, eqd["labels"], mode="clip") * cw
    gamma = jnp.where(eqd["seg"] < n_classes, gamma, 0.0)
    denom_local = jax.ops.segment_sum(gamma, eqd["seg"],
                                      num_segments=n_classes + 1)
    denom = jax.lax.psum(denom_local, ENTRIES_AXIS)
    d = jnp.take(denom, eqd["seg"], mode="clip")
    counts_e = jnp.take(eqd["counts"], eqd["seg"], mode="clip")
    contrib = jnp.where(d > MIN_EQ_WEIGHT,
                        counts_e * gamma / jnp.maximum(d, MIN_EQ_WEIGHT),
                        0.0)
    is_singleton = jnp.take(eqd["class_sizes"], eqd["seg"], mode="clip") == 1
    contrib = jnp.where(is_singleton, counts_e, contrib)
    contrib = jnp.where(eqd["seg"] < n_classes, contrib, 0.0)
    alpha_local = jax.ops.segment_sum(contrib, eqd["labels"],
                                      num_segments=num_txps)
    return jax.lax.psum(alpha_local, ENTRIES_AXIS)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8))
def run_em_sharded(mesh: Mesh, eqd: dict, alpha0, prior, num_txps: int,
                   use_vbem: bool, tol: float, min_iter: int, max_iter: int,
                   eff_lens=None):
    """Sharded analog of inference.em.run_em.

    eqd entry arrays (labels/aux/seg) must be padded to a multiple of the
    mesh size; counts/class_sizes are replicated. Singleton-class note: a
    singleton class sharded across devices would double-count, but a
    singleton has exactly one entry so it always lives on one device.
    Returns (alpha, iters, max_rel_diff) replicated.
    """
    n_classes = eqd["counts"].shape[0]
    cutoff = DEFAULTS.alpha_check_cutoff

    def inner(labels, aux, seg, counts, class_sizes, alpha0, prior,
              eff_lens):
        local = {"labels": labels, "aux": aux, "seg": seg,
                 "counts": counts, "class_sizes": class_sizes}
        cw = _local_combined_weights(local, eff_lens, n_classes)

        # markDegenerateClasses (parity with inference.em.run_em):
        # counts is replicated, so the identical mask lands everywhere
        g0 = jnp.take(alpha0, labels, mode="clip") * cw
        g0 = jnp.where(seg < n_classes, g0, 0.0)
        denom0 = jax.lax.psum(
            jax.ops.segment_sum(g0, seg, num_segments=n_classes + 1),
            ENTRIES_AXIS)
        degenerate = (denom0[:n_classes] <= MIN_EQ_WEIGHT) \
            & (class_sizes > 0)
        local["counts"] = jnp.where(degenerate, 0.0, counts)

        if use_vbem:
            def exptheta(a):
                ap = a + prior
                log_norm = jax.scipy.special.digamma(jnp.sum(ap))
                return jnp.where(
                    ap > DIGAMMA_MIN,
                    jnp.exp(jax.scipy.special.digamma(
                        jnp.maximum(ap, DIGAMMA_MIN)) - log_norm), 0.0)
        else:
            exptheta = None

        def cond(state):
            _, it, converged, _ = state
            return (it < min_iter) | ((it < max_iter) & ~converged)

        def body(state):
            alpha, it, _, _ = state
            alpha_p = _sharded_update(alpha, cw, local, num_txps,
                                      n_classes, exptheta)
            check = alpha_p > cutoff
            rel = jnp.where(check, jnp.abs(alpha - alpha_p)
                            / jnp.maximum(alpha_p, 1e-30), 0.0)
            mrd = jnp.max(rel)
            return alpha_p, it + 1, mrd <= tol, mrd

        alpha, iters, _, mrd = jax.lax.while_loop(
            cond, body, (alpha0, jnp.int32(0), jnp.bool_(False),
                         jnp.float32(jnp.inf)))
        return alpha, iters, mrd

    sharded = P(ENTRIES_AXIS)
    repl = P()
    return shard_map(
        inner, mesh=mesh,
        in_specs=(sharded, sharded, sharded, repl, repl, repl, repl, repl),
        out_specs=(repl, repl, repl))(
        eqd["labels"], eqd["aux"], eqd["seg"], eqd["counts"],
        eqd["class_sizes"], alpha0, prior, eff_lens)
