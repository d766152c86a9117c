"""Decompose the routed-EM iteration cost: sorts vs region ops vs
elementwise, at the real pack shapes."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
N_AMP = 20


def bench_amp(fn, args, reps=3):
    import jax
    import jax.numpy as jnp
    sync = jax.jit(lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))
    _ = float(sync(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(sync(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - 26.0) / N_AMP


def main():
    import jax
    import jax.numpy as jnp
    from salmon_tpu.inference import fastem
    from salmon_tpu.inference.eqclasses import PackedEqClasses

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    T = 250_000
    NCLS = 250_000
    sizes = np.minimum(1 + rng.geometric(0.35, NCLS), 50).astype(np.int32)
    E = int(sizes.sum())
    seg = np.repeat(np.arange(NCLS), sizes)
    labels = rng.integers(0, T, E).astype(np.int32)
    weights = rng.random(E)
    wsum = np.bincount(seg, weights=weights, minlength=NCLS)
    weights = weights / wsum[seg]
    counts = rng.integers(1, 50, NCLS).astype(np.float64)
    offsets = np.zeros(NCLS + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    eq = PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                         counts=counts, class_sizes=sizes)
    eff = np.full(T, 300.0)
    packed = fastem.pack_routed(eq, T, eff)
    r = packed
    print(f"# s_c={r.s_c} s_l={r.s_l} n_route={r.n_route} "
          f"c_regions={r.c_regions} l_regions={r.l_regions}", flush=True)

    key_lc, key_cl, cw_c = r.key_lc, r.key_cl, r.cw_c
    a0 = jnp.asarray(rng.random(T).astype(np.float32))

    # v2: sorts only (route there and back + multiply)
    def v2(a, key_lc, key_cl, cw):
        def body(_, a):
            x = jnp.concatenate([a, jnp.zeros(r.n_route - T, jnp.float32)])
            _, y = jax.lax.sort((key_lc, x), dimension=0, num_keys=1,
                                is_stable=False)
            y = y[:r.s_c] * cw
            y2 = jnp.concatenate([y, jnp.zeros(r.n_route - r.s_c,
                                               jnp.float32)])
            _, z = jax.lax.sort((key_cl, y2), dimension=0, num_keys=1,
                                is_stable=False)
            return a * 0.5 + z[:T] * 0.5
        return jax.lax.fori_loop(0, N_AMP, body, a)
    f2 = jax.jit(v2)
    print(f"v2 two sorts + mul: {bench_amp(f2, (a0, key_lc, key_cl, cw_c)):.3f} ms/iter", flush=True)

    # v3: expand+reduce region ops only
    cr = jnp.asarray(np.asarray(r.counts_region), jnp.float32)

    def v3(c):
        def body(_, c):
            slots = fastem._expand_regions(c, r.c_regions)
            back = fastem._reduce_regions(slots, r.c_regions)
            return c * 0.5 + back * 0.5
        return jax.lax.fori_loop(0, N_AMP, body, c)
    f3 = jax.jit(v3)
    print(f"v3 expand+reduce C regions: {bench_amp(f3, (cr,)):.3f} ms/iter",
          flush=True)

    al = jnp.asarray(rng.random(T - r.n_absent).astype(np.float32))

    def v4(a):
        def body(_, a):
            slots = fastem._expand_regions(a, r.l_regions)
            back = fastem._reduce_regions(slots, r.l_regions)
            return a * 0.5 + back * 0.5
        return jax.lax.fori_loop(0, N_AMP, body, a)
    f4 = jax.jit(v4)
    print(f"v4 expand+reduce L regions: {bench_amp(f4, (al,)):.3f} ms/iter",
          flush=True)

    # v5: elementwise contrib chain at s_c
    g0 = jnp.asarray(rng.random(r.s_c).astype(np.float32))
    d0 = jnp.asarray(rng.random(r.s_c).astype(np.float32))
    cs = jnp.asarray(rng.random(r.s_c).astype(np.float32))
    ss = jnp.asarray(rng.random(r.s_c).astype(np.float32))

    def v5(g, d, cs, ss, cw):
        def body(_, g):
            contrib = jnp.where(d > 1e-30, cs * g / jnp.maximum(d, 1e-30),
                                0.0)
            contrib = jnp.where((ss > 0) & (cw > 0), cs, contrib)
            return contrib
        return jax.lax.fori_loop(0, N_AMP, body, g)
    f5 = jax.jit(v5)
    print(f"v5 contrib elementwise: "
          f"{bench_amp(f5, (g0, d0, cs, ss, cw_c)):.3f} ms/iter",
          flush=True)

    # v6: convergence check at T
    def v6(a):
        def body(_, a):
            ap = a * 0.999
            rel = jnp.where(ap > 1e-2, jnp.abs(a - ap)
                            / jnp.maximum(ap, 1e-30), 0.0)
            return ap + jnp.max(rel) * 0.0
        return jax.lax.fori_loop(0, N_AMP, body, a)
    f6 = jax.jit(v6)
    print(f"v6 convergence check: {bench_amp(f6, (a0,)):.3f} ms/iter",
          flush=True)

    # v7: sort length sensitivity: single sort at n_route vs s_c-ish
    for n in (r.n_route, r.s_c + 16384, E + 16384):
        n8 = -(-n // 8) * 8
        key = jnp.asarray(rng.permutation(n8).astype(np.uint32))
        x = jnp.asarray(rng.random(n8).astype(np.float32))

        def v7(key, x):
            def body(_, x):
                _, y = jax.lax.sort((key, x), dimension=0, num_keys=1,
                                    is_stable=False)
                return y
            return jax.lax.fori_loop(0, N_AMP, body, x)
        f7 = jax.jit(v7)
        print(f"v7 one sort n={n8}: {bench_amp(f7, (key, x)):.3f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
