"""Probe: decompose the compaction-pool cost (sort / gather / scatter)
at human-scale expand shapes. Decides whether inline-singles can skip
the expand gather for ~80% of windows profitably.

Usage: python scripts/probe_pool_parts.py
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def log(m):
    print(m, flush=True)


def bench_amp(fn, args, reps=3, n_amp=10):
    import jax
    import jax.numpy as jnp
    sync = jax.jit(
        lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))

    def leaf(out):
        ls = jax.tree_util.tree_leaves(out)
        return max(ls, key=lambda a: a.size)
    _ = float(sync(leaf(fn(*args))))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_amp):
            out = fn(*args)
        _ = float(sync(leaf(out)))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - 26.0) / n_amp


def main():
    import jax
    import jax.numpy as jnp

    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    F = 16384 * 24
    K0 = F // 4
    n_oct = 350_000_000 // 8
    occ = jnp.asarray(rng.integers(0, 2**31, (n_oct, 16),
                                   dtype=np.int64).astype(np.int32))
    q0 = jnp.asarray(rng.integers(0, n_oct - 2, F, dtype=np.int64)
                     .astype(np.int32))
    need = jnp.asarray(rng.random(F) < 0.22)
    idx_bits = max(1, (F - 1).bit_length())

    @jax.jit
    def p_sort(need):
        packed = ((jnp.where(need, jnp.uint32(0), jnp.uint32(1))
                   << jnp.uint32(idx_bits))
                  | jnp.arange(F, dtype=jnp.uint32))
        return (jax.lax.sort(packed, dimension=0, is_stable=False)[:K0]
                & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)

    sel = p_sort(need)

    @jax.jit
    def p_gather(occ, q0, sel):
        return jnp.take(occ, jnp.clip(jnp.take(q0, sel), 0, None),
                        axis=0, mode="clip")

    rows_k = p_gather(occ, q0, sel)

    @jax.jit
    def p_scatter(sel, rows_k):
        return jnp.zeros((F, 16), jnp.int32).at[sel].set(
            rows_k, mode="drop")

    @jax.jit
    def p_scatter2(sel, rows_k):
        # two 8-wide planes instead of one 16-wide
        a = jnp.zeros((F, 8), jnp.int32).at[sel].set(
            rows_k[:, :8], mode="drop")
        b = jnp.zeros((F, 8), jnp.int32).at[sel].set(
            rows_k[:, 8:], mode="drop")
        return a, b

    @jax.jit
    def p_unsortperm(sel, rows_k):
        # inverse permutation via one sort: dest key = sel
        ops = (sel,) + tuple(rows_k[:, i] for i in range(16))
        out = jax.lax.sort(ops, dimension=0, num_keys=1,
                           is_stable=False)
        return out[1]

    log(f"sort-select sel  : {bench_amp(p_sort, (need,)):6.2f} ms")
    log(f"K0 row gather    : {bench_amp(p_gather, (occ, q0, sel)):6.2f} ms")
    log(f"scatter (F,16)   : {bench_amp(p_scatter, (sel, rows_k)):6.2f} ms")
    log(f"scatter 2x(F,8)  : {bench_amp(p_scatter2, (sel, rows_k)):6.2f} ms")
    log(f"unsort-perm sort : {bench_amp(p_unsortperm, (sel, rows_k)):6.2f} ms")


if __name__ == "__main__":
    main()
