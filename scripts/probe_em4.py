"""Probe 4: sort-shape costs for the sort-routed EM design."""

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
    E = 964_064

    # sort shapes: static key + 1 f32 payload
    shapes = [
        ("1-D flat", (E,), None),
        ("(1,E) axis1", (1, E), 1),
        ("(8,E/8) axis1", (8, E // 8), 1),
        ("(128,7532) axis1", (128, E // 128), 1),
        ("(7532,128) axis1", (E // 128, 128), 1),
    ]
    for name, shape, dim in shapes:
        n = int(np.prod(shape))
        key = jnp.asarray(
            rng.permutation(n).reshape(shape).astype(np.uint32))
        val = jnp.asarray(rng.random(shape).astype(np.float32))

        def build():
            def loop(key, val):
                def body(_, v):
                    if dim is None:
                        _, vs = jax.lax.sort((key, v), dimension=0,
                                             num_keys=1, is_stable=False)
                    else:
                        _, vs = jax.lax.sort((key, v), dimension=dim,
                                             num_keys=1, is_stable=False)
                    return vs
                return jax.lax.fori_loop(0, N_AMP, body, val)
            return jax.jit(loop), (key, val)
        log(f"sort {name}: {bench_amp(build):.3f} ms/iter")

    # sort with 2 payloads
    key = jnp.asarray(rng.permutation(E).reshape(1, E).astype(np.uint32))
    v1 = jnp.asarray(rng.random((1, E)).astype(np.float32))
    v2 = jnp.asarray(rng.random((1, E)).astype(np.float32))

    def build2():
        def loop(key, a, b):
            def body(_, st):
                a, b = st
                _, sa, sb = jax.lax.sort((key, a, b), dimension=1,
                                         num_keys=1, is_stable=False)
                return sa, sb
            return jax.lax.fori_loop(0, N_AMP, body, (a, b))[0]
        return jax.jit(loop), (key, v1, v2)
    log(f"sort (1,E) 2 payloads: {bench_amp(build2):.3f} ms/iter")

    # the "static permutation" check: does a sort whose key input is a
    # compile-time constant get optimized? (key baked as const)
    perm = rng.permutation(E).astype(np.uint32)

    def build3():
        kc = jnp.asarray(perm.reshape(1, E))
        v = jnp.asarray(rng.random((1, E)).astype(np.float32))

        def loop(v):
            def body(_, v):
                _, vs = jax.lax.sort((kc, v), dimension=1, num_keys=1,
                                     is_stable=False)
                return vs
            return jax.lax.fori_loop(0, N_AMP, body, v)
        return jax.jit(loop), (v,)
    log(f"sort (1,E) const-key: {bench_amp(build3):.3f} ms/iter")

    # grouped broadcast: alpha (T,) -> L-layout via static repeats
    T = 250_000

    def build_b():
        a = jnp.asarray(rng.random(T).astype(np.float32))

        def loop(a):
            def body(_, a):
                # two buckets: first 200k txps W=2, rest W=8
                b1 = jnp.repeat(a[:200_000].reshape(-1, 1), 2,
                                axis=1).reshape(-1)
                b2 = jnp.repeat(a[200_000:].reshape(-1, 1), 8,
                                axis=1).reshape(-1)
                out = jnp.concatenate([b1, b2])
                return a * 0.5 + out[:T] * 0.5
            return jax.lax.fori_loop(0, N_AMP, body, a)
        return jax.jit(loop), (a,)
    log(f"grouped broadcast T->E: {bench_amp(build_b):.3f} ms/iter")

    # digamma at T (VBEM exptheta cost)
    def build_d():
        a = jnp.asarray(rng.random(T).astype(np.float32) + 0.5)

        def loop(a):
            def body(_, a):
                lg = jax.scipy.special.digamma(jnp.sum(a))
                return jnp.exp(jax.scipy.special.digamma(a) - lg) + 0.1
            return jax.lax.fori_loop(0, N_AMP, body, a)
        return jax.jit(loop), (a,)
    log(f"VBEM exptheta at T: {bench_amp(build_d):.3f} ms/iter")


if __name__ == "__main__":
    main()
