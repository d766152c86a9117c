"""Probe: decompose the banded-DP stage at bench shapes
(K = 65536 fused problems, L = 104, bandwidth 15).

Usage: python scripts/probe_dp_split.py
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
    from salmon_tpu.mapping.align import (_banded_scores_pallas,
                                          _fetch_windows_packed,
                                          pack_seq4)

    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    K, L, bw = 65536, 104, 15
    B = 2 * bw + 1
    W = L + B - 1
    NR = 4 * 16384

    seq = rng.integers(0, 4, 360_000_000).astype(np.uint8)
    words, shift = pack_seq4(seq)
    words = jnp.asarray(words)
    reads = jnp.asarray(rng.integers(0, 4, (NR, L)).astype(np.uint8))
    ids = jnp.asarray(rng.integers(0, NR, K).astype(np.int32))
    a0 = jnp.asarray(rng.integers(0, 359_000_000, K))
    lens = jnp.asarray(np.full(K, 100, np.int32))
    starts = jnp.asarray(np.zeros(K, np.int32))

    @jax.jit
    def v_fetch(words, a0):
        return _fetch_windows_packed(words, a0, W)

    @jax.jit
    def v_fetch_t(words, a0, reads, ids):
        ref_win = _fetch_windows_packed(words, a0, W)
        reads_p = jnp.take(reads, ids, axis=0, mode="clip")
        return ref_win.T, reads_p.T

    @jax.jit
    def v_all(words, a0, reads, ids, lens, starts):
        ref_win = _fetch_windows_packed(words, a0, W)
        reads_p = jnp.take(reads, ids, axis=0, mode="clip")
        return _banded_scores_pallas(
            reads_p.T.astype(jnp.int8), ref_win.T.astype(jnp.int8),
            lens, bw, 2.0, -4.0, 6.0, 2.0, read_starts=starts)

    t_f = bench_amp(v_fetch, (words, a0))
    t_ft = bench_amp(v_fetch_t, (words, a0, reads, ids))
    t_all = bench_amp(v_all, (words, a0, reads, ids, lens, starts))
    log(f"window fetch            : {t_f:6.2f} ms")
    log(f"fetch + transposes      : {t_ft:6.2f} ms")
    log(f"full (skew + kernel)    : {t_all:6.2f} ms")


if __name__ == "__main__":
    main()
