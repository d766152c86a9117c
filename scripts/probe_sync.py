"""Readback-forced timing: device_get a scalar derived from the output
so the measured interval includes real execution."""

import time
import numpy as np


def bench_rb(fn, args_list, reps=12, warmup=2):
    import jax
    import jax.numpy as jnp
    sync = jax.jit(lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))
    for a in args_list[:warmup]:
        out = fn(*a)
        _ = float(sync(out if not isinstance(out, tuple) else out[0]))
    ts = []
    for r in range(reps):
        a = args_list[r % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(sync(out if not isinstance(out, tuple) else out[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    E, T = 964_064, 250_000

    # null (dispatch+readback floor)
    f0 = jax.jit(lambda x: x)
    xs = [(jnp.asarray(rng.random(8).astype(np.float32)),)]
    log(f"floor tiny passthrough: {bench_rb(f0, xs):.3f} ms")

    f = jax.jit(lambda x: x * 2.0 + 1.0)
    diff = [(jnp.asarray(rng.random(E).astype(np.float32)),)
            for _ in range(8)]
    log(f"elementwise E: {bench_rb(f, diff):.3f} ms")

    f3 = jax.jit(lambda a, b: a @ b)
    mk = lambda: jnp.asarray(
        rng.standard_normal((4096, 4096)).astype(np.float32).astype(
            jnp.bfloat16))
    diff = [(mk(), mk()) for _ in range(4)]
    ms = bench_rb(f3, diff)
    log(f"matmul4096 bf16: {ms:.3f} ms ({137.4 / ms:.0f} TFLOP/s)")

    lab = jnp.asarray(rng.integers(0, T, E).astype(np.int32))
    v = jnp.asarray(rng.random(E).astype(np.float32))

    def em1(a, lab, v):
        g = jnp.take(a, lab, mode="clip") * v
        return jax.ops.segment_sum(g, lab, num_segments=T)
    f1 = jax.jit(em1)
    diff = [(jnp.asarray(rng.random(T).astype(np.float32)), lab, v)
            for _ in range(8)]
    log(f"EM 1-iter (take+segsum): {bench_rb(f1, diff):.3f} ms")

    def emloop(a, lab, v, n):
        def body(_, a):
            g = jnp.take(a, lab, mode="clip") * v
            return jax.ops.segment_sum(g, lab, num_segments=T)
        return jax.lax.fori_loop(0, n, body, a)
    import functools
    f2 = jax.jit(functools.partial(emloop, n=10))
    log(f"EM 10-iter loop: {bench_rb(f2, diff):.3f} ms")
    f2b = jax.jit(functools.partial(emloop, n=100))
    log(f"EM 100-iter loop: {bench_rb(f2b, diff):.3f} ms")

    f4 = jax.jit(lambda v, i: jnp.zeros(T, jnp.float32).at[i].add(v))
    diff4 = [(jnp.asarray(rng.random(E).astype(np.float32)),
              jnp.asarray(rng.integers(0, T, E).astype(np.int32)))
             for _ in range(8)]
    log(f"scatter-add: {bench_rb(f4, diff4):.3f} ms")

    f5 = jax.jit(lambda x: jnp.cumsum(x))
    log(f"cumsum E: {bench_rb(f5, diff[:1] and [(d[0],) for d in diff4]):.3f} ms")

    f6 = jax.jit(lambda a, i: jnp.take(a, i, mode="clip"))
    diff6 = [(jnp.asarray(rng.random(T).astype(np.float32)),
              jnp.asarray(rng.integers(0, T, E).astype(np.int32)))
             for _ in range(8)]
    log(f"take 1-D E: {bench_rb(f6, diff6):.3f} ms")

    # sort (mapping pipeline hot op): (4096, 1024) u32 1-key sort
    f7 = jax.jit(lambda k, p: jax.lax.sort((k, p), dimension=1,
                                           num_keys=1, is_stable=False))
    diff7 = [(jnp.asarray(rng.integers(0, 2**31, (4096, 1024)).astype(
        np.uint32)), jnp.asarray(rng.integers(0, 2**31, (4096, 1024)).astype(
            np.int32))) for _ in range(4)]
    log(f"sort (4096,1024) 1key+1payload: {bench_rb(f7, diff7):.3f} ms")


if __name__ == "__main__":
    main()
