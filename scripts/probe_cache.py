"""Is the axon runtime caching results of repeated identical executions?

Times each op two ways: same input every rep vs cycling 8 distinct
inputs. Also a matmul with known FLOPs as a speed-of-light sanity check.
"""

import time

import numpy as np


def bench_multi(fn, args_list, reps=16, warmup=2):
    import jax
    for a in args_list[:warmup]:
        out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for r in range(reps):
        a = args_list[r % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
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
    E, T = 964_064, 250_000

    # elementwise
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    same = [(jnp.asarray(rng.random(E).astype(np.float32)),)]
    diff = [(jnp.asarray(rng.random(E).astype(np.float32)),)
            for _ in range(8)]
    log(f"elementwise same-input: {bench_multi(f, same):.3f} ms")
    log(f"elementwise diff-inputs: {bench_multi(f, diff):.3f} ms")

    # EM-shaped fori_loop
    lab = jnp.asarray(rng.integers(0, T, E).astype(np.int32))
    v = jnp.asarray(rng.random(E).astype(np.float32))

    def emloop(a, lab, v):
        def body(_, a):
            g = jnp.take(a, lab, mode="clip") * v
            return jax.ops.segment_sum(g, lab, num_segments=T)
        return jax.lax.fori_loop(0, 10, body, a)
    f2 = jax.jit(emloop)
    same = [(jnp.asarray(rng.random(T).astype(np.float32)), lab, v)]
    diff = [(jnp.asarray(rng.random(T).astype(np.float32)), lab, v)
            for _ in range(8)]
    log(f"EM 10-iter same-input: {bench_multi(f2, same):.3f} ms")
    log(f"EM 10-iter diff-inputs: {bench_multi(f2, diff):.3f} ms")

    # matmul speed-of-light check: 4096^3 * 2 = 137 GFLOP
    f3 = jax.jit(lambda a, b: a @ b)
    mk = lambda: jnp.asarray(
        rng.standard_normal((4096, 4096)).astype(np.float32).astype(
            jnp.bfloat16))
    same = [(mk(), mk())]
    diff = [(mk(), mk()) for _ in range(4)]
    ms_s = bench_multi(f3, same)
    ms_d = bench_multi(f3, diff)
    log(f"matmul4096 bf16 same: {ms_s:.3f} ms "
        f"({137.4 / ms_s:.0f} TFLOP/s)")
    log(f"matmul4096 bf16 diff: {ms_d:.3f} ms "
        f"({137.4 / ms_d:.0f} TFLOP/s)")

    # big scatter with distinct inputs
    f4 = jax.jit(lambda v, i: jnp.zeros(T, jnp.float32).at[i].add(v))
    diff = [(jnp.asarray(rng.random(E).astype(np.float32)),
             jnp.asarray(rng.integers(0, T, E).astype(np.int32)))
            for _ in range(8)]
    log(f"scatter-add diff-inputs: {bench_multi(f4, diff):.3f} ms")

    # 1-D take with distinct inputs
    f5 = jax.jit(lambda a, i: jnp.take(a, i, mode="clip"))
    diff = [(jnp.asarray(rng.random(T).astype(np.float32)),
             jnp.asarray(rng.integers(0, T, E).astype(np.int32)))
            for _ in range(8)]
    log(f"take diff-inputs: {bench_multi(f5, diff):.3f} ms")

    # cumsum with distinct inputs
    f6 = jax.jit(lambda x: jnp.cumsum(x))
    diff = [(jnp.asarray(rng.random(E).astype(np.float32)),)
            for _ in range(8)]
    log(f"cumsum diff-inputs: {bench_multi(f6, diff):.3f} ms")

    # row-gather (round-1 style) distinct inputs
    tbl = jnp.asarray(rng.random((200_000, 4)).astype(np.int32))
    f7 = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))
    diff = [(tbl, jnp.asarray(
        rng.integers(0, 200_000, (4096, 9, 16)).astype(np.int32)))
        for _ in range(8)]
    log(f"row-gather (4096,9,16)x4 diff-inputs: "
        f"{bench_multi(f7, diff):.3f} ms")


if __name__ == "__main__":
    main()
