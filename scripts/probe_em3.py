"""Third-round probes: table-size cliff, transposes, routing variants."""

import time

import numpy as np

N_AMP = 20


def bench_amp(build_loop, reps=3):
    import jax
    import jax.numpy as jnp
    fn, args = build_loop()
    sync = jax.jit(lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))
    _ = float(sync(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(sync(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - 26.0) / N_AMP


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

    # 1) take_along_axis: table-row sweep at fixed index count (EL,128)
    for rows in (TR, 2 * TR, 4 * TR, EL, 2 * EL):
        tbl = jnp.asarray(rng.random((rows, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, rows, (EL, 128)).astype(np.int32))

        def build():
            def loop(tbl, idx):
                def body(_, acc):
                    y = jnp.take_along_axis(acc, idx, axis=0)
                    return acc * 0.5 + y[:acc.shape[0]] * 0.5 \
                        if y.shape[0] >= acc.shape[0] else acc.at[
                            :y.shape[0]].add(y * 0.5) * 0.5
                return jax.lax.fori_loop(0, N_AMP, body, tbl)
            return jax.jit(loop), (tbl, idx)
        log(f"1) taa idx=(EL,128) table=({rows},128): "
            f"{bench_amp(build):.3f} ms/iter")

    # 1b) index-count sweep at fixed (TR,128) table
    tbl = jnp.asarray(rng.random((TR, 128)).astype(np.float32))
    for irows in (TR, 2 * TR, EL, 2 * EL):
        idx = jnp.asarray(rng.integers(0, TR, (irows, 128)).astype(np.int32))

        def build():
            def loop(tbl, idx):
                def body(_, acc):
                    y = jnp.take_along_axis(acc, idx, axis=0)
                    return acc * 0.5 + y[:TR] * 0.5
                return jax.lax.fori_loop(0, N_AMP, body, tbl)
            return jax.jit(loop), (tbl, idx)
        log(f"1b) taa idx=({irows},128) table=(TR,128): "
            f"{bench_amp(build):.3f} ms/iter")

    # 2) tile transpose (NB,128,128) swap last two
    NB = EL // 128 + 1

    def build_t():
        x = jnp.asarray(rng.random((NB, 128, 128)).astype(np.float32))

        def loop(x):
            def body(_, acc):
                return jnp.swapaxes(acc, 1, 2) * 0.999
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x,)
    log(f"2) tile transpose (NB={NB},128,128): {bench_amp(build_t):.3f} "
        f"ms/iter")

    # 3) masked 4-channel combine at E
    def build_m():
        xs = [jnp.asarray(rng.random((EL, 128)).astype(np.float32))
              for _ in range(4)]
        ms = [jnp.asarray(rng.integers(0, 2, (EL, 128)).astype(bool))
              for _ in range(4)]

        def loop(a, b, c, d, m0, m1, m2, m3):
            def body(_, acc):
                y = (jnp.where(m0, a, 0) + jnp.where(m1, b, 0)
                     + jnp.where(m2, c, 0) + jnp.where(m3, acc, 0))
                return y
            return jax.lax.fori_loop(0, N_AMP, body, d)
        return jax.jit(loop), (*xs[:3], xs[3], *ms)
    log(f"3) masked 4-way combine: {bench_amp(build_m):.3f} ms/iter")

    # 4) per-lane segmented scan (associative_scan axis 0) at (EL,128)
    def build_s():
        x = jnp.asarray(rng.random((EL, 128)).astype(np.float32))
        flags = jnp.asarray(rng.integers(0, 2, (EL, 128)).astype(bool))

        def loop(x, flags):
            def body(_, acc):
                def comb(a, b):
                    fa, va = a
                    fb, vb = b
                    return fa | fb, jnp.where(fb, vb, va + vb)
                _, out = jax.lax.associative_scan(comb, (flags, acc),
                                                  axis=0)
                return out
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x, flags)
    log(f"4) seg-scan axis0 (EL,128): {bench_amp(build_s):.3f} ms/iter")

    # 5) one-hot einsum with bf16 hi/lo split (full f32 routing)
    RB = EL
    perm = rng.permutation(128 * RB) % 128
    P = np.zeros((RB, 128, 128), np.float32)
    P[np.repeat(np.arange(RB), 128),
      np.tile(np.arange(128), RB), perm] = 1.0
    Pb = jnp.asarray(P.astype(jnp.bfloat16))
    del P

    def build_hl():
        x = jnp.asarray(rng.random((RB, 128)).astype(np.float32))

        def loop(x, Pb):
            def body(_, acc):
                hi = acc.astype(jnp.bfloat16)
                lo = (acc - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                y = (jnp.einsum("rl,rlm->rm", hi, Pb,
                                preferred_element_type=jnp.float32)
                     + jnp.einsum("rl,rlm->rm", lo, Pb,
                                  preferred_element_type=jnp.float32))
                return y
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x, Pb)
    log(f"5) onehot route bf16 hi/lo: {bench_amp(build_hl):.3f} ms/iter")

    # 6) transpose+gather+transpose routing (within-row movement)
    def build_tg():
        x = jnp.asarray(rng.random((NB, 128, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 128,
                                       (NB, 128, 128)).astype(np.int32))

        def loop(x, idx):
            def body(_, acc):
                xt = jnp.swapaxes(acc, 1, 2)
                g = jnp.take_along_axis(xt, idx, axis=1)
                return jnp.swapaxes(g, 1, 2)
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x, idx)
    log(f"6) transpose-gather-transpose: {bench_amp(build_tg):.3f} ms/iter")

    # 7) strided reduce widths: (X,16,8)->sum vs (X,8,16)
    def build_r(shape, ax):
        x = jnp.asarray(rng.random((EL, 128)).astype(np.float32))

        def loop(x):
            def body(_, acc):
                g = acc.reshape(EL, *shape)
                d = g.sum(axis=ax, keepdims=True)
                return (g + d).reshape(EL, 128)
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x,)
    import functools
    log(f"7a) reduce (EL,16,8) ax2: "
        f"{bench_amp(functools.partial(build_r, (16, 8), 2)):.3f} ms/iter")
    log(f"7b) reduce (EL,2,64) ax2: "
        f"{bench_amp(functools.partial(build_r, (2, 64), 2)):.3f} ms/iter")

    # 8) lane roll
    def build_roll():
        x = jnp.asarray(rng.random((EL, 128)).astype(np.float32))

        def loop(x):
            def body(_, acc):
                return (jnp.roll(acc, 32, axis=1)
                        + jnp.roll(acc, 64, axis=1)) * 0.5
            return jax.lax.fori_loop(0, N_AMP, body, x)
        return jax.jit(loop), (x,)
    log(f"8) 2 lane-rolls (EL,128): {bench_amp(build_roll):.3f} ms/iter")


if __name__ == "__main__":
    main()
