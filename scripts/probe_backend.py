"""Probe the axon backend's op-cost model: what makes an op cost ~25ms?

Size sweeps for elementwise / take / cumsum / segment_sum, input-source
variants (fresh upload vs computed-on-device), dtype variants.
"""

import sys
import time

import numpy as np


def bench(fn, *args, reps=8, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    log("## elementwise x*2+1 f32, size sweep")
    for n in (8_192, 65_536, 524_288, 964_064, 4_194_304):
        x = jnp.asarray(rng.random(n).astype(np.float32))
        f = jax.jit(lambda x: x * 2.0 + 1.0)
        log(f"n={n}: {bench(f, x):.3f} ms")

    log("## elementwise on device-computed input (y = x+0 first)")
    x = jnp.asarray(rng.random(964_064).astype(np.float32))
    g0 = jax.jit(lambda x: x + 0.0)
    y = g0(x)
    jax.block_until_ready(y)
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    log(f"n=964064 computed-input: {bench(f, y):.3f} ms")

    log("## 2-op chain vs 1-op (fusion overhead?)")
    f2 = jax.jit(lambda x: (x * 2.0 + 1.0) * 0.5)
    log(f"chain: {bench(f2, x):.3f} ms")

    log("## take 1-D, size sweep (table 250k)")
    T = 250_000
    a = jnp.asarray(rng.random(T).astype(np.float32))
    for n in (65_536, 964_064, 4_194_304):
        i = jnp.asarray(rng.integers(0, T, n).astype(np.int32))
        f = jax.jit(lambda a, i: jnp.take(a, i, mode="clip"))
        log(f"n={n}: {bench(f, a, i):.3f} ms")

    log("## take then elementwise (mixed)")
    i = jnp.asarray(rng.integers(0, T, 964_064).astype(np.int32))
    f = jax.jit(lambda a, i: jnp.take(a, i, mode="clip") * 2.0 + 1.0)
    log(f"take+elemwise: {bench(f, a, i):.3f} ms")

    log("## reduce (sum) f32")
    for n in (964_064, 4_194_304):
        x = jnp.asarray(rng.random(n).astype(np.float32))
        f = jax.jit(lambda x: jnp.sum(x))
        log(f"sum n={n}: {bench(f, x):.3f} ms")

    log("## segment_sum output-size sweep (E=964064)")
    E = 964_064
    v = jnp.asarray(rng.random(E).astype(np.float32))
    for T2 in (1024, 65_536, 250_000):
        s = jnp.asarray(np.sort(rng.integers(0, T2, E)).astype(np.int32))
        f = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=T2))
        log(f"T={T2}: {bench(f, v, s):.3f} ms")

    log("## dispatch floor (tiny op)")
    x = jnp.asarray(np.ones(8, np.float32))
    f = jax.jit(lambda x: x + 1.0)
    log(f"tiny: {bench(f, x):.3f} ms")

    log("## cumsum size sweep")
    for n in (65_536, 524_288, 964_064):
        x = jnp.asarray(rng.random(n).astype(np.float32))
        f = jax.jit(lambda x: jnp.cumsum(x))
        log(f"n={n}: {bench(f, x):.3f} ms")

    log("## scatter-add output sweep (E=964064)")
    for T2 in (1024, 250_000):
        i = jnp.asarray(rng.integers(0, T2, E).astype(np.int32))
        f = jax.jit(lambda v, i: jnp.zeros(T2, jnp.float32).at[i].add(v))
        log(f"T={T2}: {bench(f, v, i):.3f} ms")

    log("## while_loop of 10 elementwise iters (n=964064)")
    x = jnp.asarray(rng.random(964_064).astype(np.float32))

    def loop(x):
        def body(st):
            a, i = st
            return a * 0.99 + 0.01, i + 1
        def cond(st):
            return st[1] < 10
        a, _ = jax.lax.while_loop(cond, body, (x, 0))
        return a
    f = jax.jit(loop)
    log(f"10 iters: {bench(f, x):.3f} ms")

    log("## fori_loop 10x (gather+segsum) EM-shaped (E=964064,T=250k)")
    lab = jnp.asarray(rng.integers(0, T, E).astype(np.int32))

    def emloop(a, lab, v):
        def body(_, a):
            g = jnp.take(a, lab, mode="clip") * v
            return jax.ops.segment_sum(g, lab, num_segments=T)
        return jax.lax.fori_loop(0, 10, body, a)
    f = jax.jit(emloop)
    a0 = jnp.asarray(rng.random(T).astype(np.float32))
    log(f"10 EM-ish iters: {bench(f, a0, lab, v):.3f} ms")


if __name__ == "__main__":
    main()
