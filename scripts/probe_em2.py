"""Loop-amplified probes for the fast-EM design candidates.

Everything runs inside fori_loop xN with one readback, so the ~26ms
tunnel floor is amortized and executions are real.
"""

import functools
import time

import numpy as np

N_AMP = 20


def bench_amp(build_loop, reps=3):
    """build_loop() -> jitted fn taking (x0,) returning array; we time
    full N_AMP-iteration loops."""
    import jax
    import jax.numpy as jnp
    fn, args = build_loop()
    sync = jax.jit(lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))
    _ = float(sync(fn(*args)))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(sync(fn(*args)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    return (med - 26.0) / N_AMP  # subtract measured floor, per-iter ms


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"# device: {jax.devices()[0].device_kind}, amp={N_AMP}")
    rng = np.random.default_rng(0)
    E, T = 964_064, 250_000
    TR = -(-T // 128)
    EL = -(-E // 128)

    alpha2d = jnp.asarray(rng.random((TR, 128)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, TR, (EL, 128)).astype(np.int32))
    cw = jnp.asarray(rng.random((EL, 128)).astype(np.float32))

    # a) per-lane gather (take_along_axis axis=0)
    def build_a():
        def loop(a, rows, cw):
            def body(_, acc):
                y = jnp.take_along_axis(a, rows, axis=0) * cw
                return acc * 0.5 + y[:TR, :]
            return jax.lax.fori_loop(0, N_AMP, body, a)
        return jax.jit(loop), (alpha2d, rows, cw)
    log(f"a) take_along_axis (EL,128)<-(TR,128): {bench_amp(build_a):.3f} "
        f"ms/iter")

    # b) batched one-hot permute at E via einsum (bf16)
    RB = EL
    perm = rng.permutation(128 * RB) % 128
    P = np.zeros((RB, 128, 128), np.float32)
    P[np.repeat(np.arange(RB), 128),
      np.tile(np.arange(128), RB), perm] = 1.0
    Pb = jnp.asarray(P.astype(jnp.bfloat16))

    def build_b():
        x = jnp.asarray(rng.random((RB, 128)).astype(np.float32))

        def loop(x, Pb):
            def body(_, acc):
                y = jnp.einsum("rl,rlm->rm", acc.astype(jnp.bfloat16), Pb,
                               preferred_element_type=jnp.float32)
                return y
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x, Pb)
    log(f"b) batched onehot permute (E): {bench_amp(build_b):.3f} ms/iter")

    # c) lane-minor strided reduce (Rc,16,8) -> (Rc,16) broadcast back
    def build_c():
        x = jnp.asarray(rng.random((EL, 128)).astype(np.float32))

        def loop(x):
            def body(_, acc):
                g = acc.reshape(EL, 16, 8)
                d = g.sum(axis=2, keepdims=True)
                return (g / jnp.maximum(d, 1e-30)).reshape(EL, 128)
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x,)
    log(f"c) strided reduce+bcast (E): {bench_amp(build_c):.3f} ms/iter")

    # d) transposed gather-scatter: (TR*W,128) gather + reshape sum
    W = 4
    trow = jnp.asarray(rng.integers(0, EL, (TR * W, 128)).astype(np.int32))

    def build_d():
        x = jnp.asarray(rng.random((EL, 128)).astype(np.float32))

        def loop(x, trow):
            def body(_, acc):
                g = jnp.take_along_axis(
                    jnp.concatenate([acc, acc[:TR * W - EL if TR * W > EL
                                              else 0]], axis=0)
                    if False else acc, jnp.clip(trow, 0, EL - 1), axis=0)
                a = g.reshape(TR, W, 128).sum(axis=1)
                return jnp.concatenate(
                    [a, jnp.zeros((EL - TR, 128), jnp.float32)], axis=0)
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x, trow)
    log(f"d) transposed gather (TR*{W},128)+sum: {bench_amp(build_d):.3f} "
        f"ms/iter")

    # e) current EM iteration for reference
    lab = jnp.asarray(rng.integers(0, T, E).astype(np.int32))
    v = jnp.asarray(rng.random(E).astype(np.float32))

    def build_e():
        a0 = jnp.asarray(rng.random(T).astype(np.float32))

        def loop(a, lab, v):
            def body(_, a):
                g = jnp.take(a, lab, mode="clip") * v
                return jax.ops.segment_sum(g, lab, num_segments=T)
            return jax.lax.fori_loop(0, N_AMP, body, a)
        return jax.jit(loop), (a0, lab, v)
    log(f"e) xla 1-D gather+segsum iter: {bench_amp(build_e):.3f} ms/iter")

    # f) 2-D cumsum along axis 0 / axis 1 at (EL,128)
    def build_f(axis):
        x = jnp.asarray(rng.random((EL, 128)).astype(np.float32))

        def loop(x):
            def body(_, acc):
                return jnp.cumsum(acc, axis=axis) * 1e-3
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x,)
    log(f"f0) cumsum axis0 (EL,128): "
        f"{bench_amp(functools.partial(build_f, 0)):.3f} ms/iter")
    log(f"f1) cumsum axis1 (EL,128): "
        f"{bench_amp(functools.partial(build_f, 1)):.3f} ms/iter")

    # g) sort at mapping shape (4096, 1024), 1 key + 1 payload
    def build_g():
        k = jnp.asarray(rng.integers(0, 2**31, (4096, 1024)).astype(
            np.uint32))
        p = jnp.asarray(rng.integers(0, 2**31, (4096, 1024)).astype(
            np.int32))

        def loop(k, p):
            def body(_, st):
                kk, pp = st
                ks, ps = jax.lax.sort((kk, pp), dimension=1, num_keys=1,
                                      is_stable=False)
                return (ks ^ jnp.uint32(1), ps)
            return jax.lax.fori_loop(0, N_AMP, body, (k, p))[1]
        return jax.jit(loop), (k, p)
    log(f"g) sort (4096,1024) 1k+1p: {bench_amp(build_g):.3f} ms/iter")

    # h) elementwise baseline at E 2-D
    def build_h():
        x = jnp.asarray(rng.random((EL, 128)).astype(np.float32))

        def loop(x):
            def body(_, acc):
                return acc * 0.999 + 0.001
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x,)
    log(f"h) elementwise (EL,128): {bench_amp(build_h):.3f} ms/iter")

    # i) 1-D take alone, loop-amplified
    def build_i():
        a0 = jnp.asarray(rng.random(T).astype(np.float32))

        def loop(a, lab):
            def body(_, a):
                g = jnp.take(a, lab, mode="clip")
                return a * 0.5 + g[:T] * 0.5
            return jax.lax.fori_loop(0, N_AMP, body, a)
        return jax.jit(loop), (a0, lab)
    log(f"i) 1-D take E: {bench_amp(build_i):.3f} ms/iter")

    # j) 1-D segment_sum alone
    def build_j():
        x = jnp.asarray(rng.random(E).astype(np.float32))

        def loop(x, lab):
            def body(_, x):
                s = jax.ops.segment_sum(x, lab, num_segments=T)
                return x * 0.5 + jnp.tile(s, E // T + 1)[:E] * 1e-3
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x, lab)
    log(f"j) 1-D segsum E->T: {bench_amp(build_j):.3f} ms/iter")


if __name__ == "__main__":
    main()
