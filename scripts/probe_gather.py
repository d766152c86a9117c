"""Gather cost into multi-GB arrays: random vs index-sorted access.

Tests the route-by-sort hypothesis for the seed stage: a gather of N
rows from a multi-GB HBM operand may be latency/locality-bound with
random indices but near-bandwidth with ascending indices. If sorted
gathers are much faster, the sparse seed flow should sort its occ-row
indices, gather, and un-sort via a precomputed destination key (the
fastem route pattern).

Usage: python scripts/probe_gather.py [human|sample]
"""

import os
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.97")
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
CACHE = os.environ.get(
    "BENCH_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                "salmon_tpu_bench"))
N_AMP = int(os.environ.get("N_AMP", 6))


def bench_amp(fn, args, reps=3, n_amp=N_AMP):
    import jax
    import jax.numpy as jnp
    sync = jax.jit(lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))
    _ = float(sync(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_amp):
            out = fn(*args)
        _ = float(sync(out))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - 26.0) / n_amp


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    # a 2.8 GB 2-column table (the occ_rows shape at human scale)
    n_occ = 349_000_000
    occ = jnp.asarray(
        rng.integers(0, 2**31, (n_occ, 2), dtype=np.int64).astype(
            np.int32))

    N = 1_000_000
    idx_rand = rng.integers(0, n_occ, N).astype(np.int32)
    idx_sorted = np.sort(idx_rand)
    # clustered: random starts, 8 consecutive rows each (CSR-run shape)
    starts = rng.integers(0, n_occ - 8, N // 8).astype(np.int32)
    idx_clust = (starts[:, None] + np.arange(8, dtype=np.int32)).reshape(-1)
    idx_clust_sorted = np.sort(idx_clust)

    for name, ids in (("random", idx_rand), ("sorted", idx_sorted),
                      ("clustered", idx_clust),
                      ("clustered+sorted", idx_clust_sorted)):
        d = jnp.asarray(ids)
        f = jax.jit(lambda i, t: jnp.take(t, i, axis=0))
        ms = bench_amp(f, (d, occ))
        log(f"occ row gather N={N} {name}: {ms:.2f} ms "
            f"({ms*1e6/N:.1f} ns/row)")

    # route pattern: sort ids (carrying a dest key), gather, un-sort
    dest = np.empty(N, np.uint32)
    dest[np.argsort(idx_rand, kind="stable")] = np.arange(N, dtype=np.uint32)
    dd = jnp.asarray(dest)
    di = jnp.asarray(idx_rand)

    def routed(i, dkey, t):
        i_s, d_s = jax.lax.sort((i, dkey), dimension=0, num_keys=1,
                                is_stable=False)
        g = jnp.take(t, i_s, axis=0)
        _, o0, o1 = jax.lax.sort(
            (d_s, g[:, 0], g[:, 1]), dimension=0, num_keys=1,
            is_stable=False)
        return o0 + o1
    ms = bench_amp(jax.jit(routed), (di, dd, occ))
    log(f"occ row gather N={N} routed (sort+gather+unsort): {ms:.2f} ms")

    # lookup-shaped gather: 786k x 16-wide rows from a 4 GB table
    n_buckets = 67_108_864
    tab = jnp.asarray(
        rng.integers(0, 2**31, (n_buckets, 16), dtype=np.int64).astype(
            np.int32))
    M = 786_432
    b_rand = rng.integers(0, n_buckets, M).astype(np.int32)
    b_sorted = np.sort(b_rand)
    for name, ids in (("random", b_rand), ("sorted", b_sorted)):
        d = jnp.asarray(ids)
        f = jax.jit(lambda i, t: jnp.take(t, i, axis=0))
        ms = bench_amp(f, (d, tab))
        log(f"bucket row(16) gather M={M} {name}: {ms:.2f} ms "
            f"({ms*1e6/M:.1f} ns/row)")

    # small-table control: same gather into a 16 MB table
    small = jnp.asarray(
        rng.integers(0, 2**31, (2_000_000, 2), dtype=np.int64).astype(
            np.int32))
    ids = jnp.asarray(rng.integers(0, 2_000_000, N).astype(np.int32))
    f = jax.jit(lambda i, t: jnp.take(t, i, axis=0))
    log(f"small-table row gather N={N} random: "
        f"{bench_amp(f, (ids, small)):.2f} ms")


if __name__ == "__main__":
    main()
