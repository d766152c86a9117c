"""Probe: random row-gather cost into human-scale tables, and the
expand stage's gather/scan split.

Questions (2026-08-20, round 3 seed attack):
  1. ns/row for 8-wide i32 row gathers into a ~2.8 GB table vs a small
     table (does table size change the per-row cost?).
  2. Do 3 CONSECUTIVE rows per window cost 3x one row, or less?
  3. expand_occurrences: how much is gather vs the separator scans?
  4. score_candidates sort cost at hs shapes.

Usage: python scripts/probe_hs_gather.py
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

    R, P = 16384, 24
    NW = R * P  # windows per end at hs

    for n_rows, tag in ((350_000_000 // 4, "hs-occ (2.8GB)"),
                        (1 << 20, "8MB"),
                        (1 << 14, "128KB")):
        tab = jnp.asarray(
            rng.integers(0, 2**31, (n_rows, 8), dtype=np.int64)
            .astype(np.int32))
        idx1 = jnp.asarray(
            rng.integers(0, n_rows, NW, dtype=np.int64).astype(np.int32))

        @jax.jit
        def g1(tab, idx):
            return jnp.take(tab, idx, axis=0, mode="clip")

        @jax.jit
        def g3_consec(tab, idx):
            ridx = idx[:, None] + jnp.arange(3, dtype=jnp.int32)
            return jnp.take(tab, jnp.clip(ridx, 0, None), axis=0,
                            mode="clip")

        @jax.jit
        def g3_dup(tab, idx):
            # rows 2,3 clamped to row 1's index — does hardware/XLA
            # dedup identical consecutive row fetches?
            ridx = jnp.broadcast_to(idx[:, None], (idx.shape[0], 3))
            return jnp.take(tab, ridx, axis=0, mode="clip")

        t1 = bench_amp(g1, (tab, idx1))
        t3 = bench_amp(g3_consec, (tab, idx1))
        t3d = bench_amp(g3_dup, (tab, idx1))
        log(f"{tag}: 1row {t1:6.2f} ms ({t1/NW*1e6:5.1f} ns/row)  "
            f"3consec {t3:6.2f} ms ({t3/(3*NW)*1e6:5.1f} ns/row)  "
            f"3dup {t3d:6.2f} ms")
        del tab

    # expand gather vs scan split on synthetic hs-shaped inputs
    from salmon_tpu.mapping.score import gather_occ_oct, score_candidates

    n_rows = 350_000_000 // 4
    occ = jnp.asarray(rng.integers(0, 2**31, (n_rows, 8), dtype=np.int64)
                      .astype(np.int32))
    start = jnp.asarray(
        rng.integers(0, n_rows * 4 - 16, (R, P), dtype=np.int64)
        .astype(np.int32))

    @jax.jit
    def g_quad(occ, start):
        return gather_occ_oct(occ, start, 8)

    t_gq = bench_amp(g_quad, (occ, start))
    log(f"gather_occ_oct C=8: {t_gq:6.2f} ms "
        f"({t_gq/(3*NW)*1e6:5.1f} ns/row over 3 rows/window)")
    del occ

    # score at hs shapes
    N = P * 8
    key = jnp.asarray(rng.integers(0, 400_000, (R, N), dtype=np.int64)
                      .astype(np.uint32))
    rpos = jnp.asarray(np.tile(
        (np.repeat(np.arange(P, dtype=np.int32) * 3, 8))[None, :],
        (R, 1)))
    diag = jnp.asarray(rng.integers(0, 100_000, (R, N), dtype=np.int64)
                       .astype(np.int32))

    @jax.jit
    def s_score(key, rpos, diag):
        return score_candidates(key, rpos, diag, 64, stride=3,
                                window_bits=8, diag_bucket_bits=5)

    t_sc = bench_amp(s_score, (key, rpos, diag))
    log(f"score_candidates (R={R}, N={N}): {t_sc:6.2f} ms")


if __name__ == "__main__":
    main()
