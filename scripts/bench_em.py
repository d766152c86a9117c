"""EM engines head-to-head at human scale (the VERDICT metric-of-record:
EM iters/s at ~856k entries / 250k txps)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from salmon_tpu.inference import em as em_mod
    from salmon_tpu.inference import fastem
    from salmon_tpu.inference.eqclasses import PackedEqClasses

    print(f"# device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    T = 250_000
    NCLS = 250_000
    sizes = np.minimum(1 + rng.geometric(0.35, NCLS), 50).astype(np.int32)
    E = int(sizes.sum())
    print(f"# T={T} NCLS={NCLS} E={E}", flush=True)
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
    total = eq.num_fragments
    a0 = em_mod.initial_alphas(T, None, total)
    pri = em_mod.prior_alphas(T, eff, 1e-2, True)

    N_IT = 50

    # routed engine
    t0 = time.perf_counter()
    packed = fastem.pack_routed(eq, T, eff)
    t_pack = time.perf_counter() - t0
    print(f"pack_routed: {t_pack:.2f}s  s_c={packed.s_c} "
          f"s_l={packed.s_l} n_route={packed.n_route}", flush=True)
    t0 = time.perf_counter()
    r = fastem.optimize_routed(eq, T, eff, a0, pri, True, 1e-12,
                               N_IT, N_IT, packed=packed)
    t_first = time.perf_counter() - t0
    print(f"routed first run (compile+{N_IT} it): {t_first:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    r = fastem.optimize_routed(eq, T, eff, a0, pri, True, 1e-12,
                               N_IT, N_IT, packed=packed)
    dt = time.perf_counter() - t0
    print(f"routed: {N_IT} iters in {dt:.3f}s -> "
          f"{N_IT / dt:.1f} iters/s ({dt / N_IT * 1e3:.2f} ms/iter)",
          flush=True)
    N2 = 200
    t0 = time.perf_counter()
    r = fastem.optimize_routed(eq, T, eff, a0, pri, True, 1e-12,
                               N2, N2, packed=packed)
    dt2b = time.perf_counter() - t0
    marg = (dt2b - dt) / (N2 - N_IT)
    print(f"routed: {N2} iters in {dt2b:.3f}s; marginal "
          f"{marg * 1e3:.2f} ms/iter -> {1 / marg:.0f} iters/s "
          f"steady-state", flush=True)

    # classic engine
    eqd, _ = em_mod.pad_eqclasses(eq)
    aj = jnp.asarray(a0, jnp.float32)
    pj = jnp.asarray(pri, jnp.float32)
    ej = jnp.asarray(eff, jnp.float32)
    t0 = time.perf_counter()
    out = em_mod.run_em(eqd, aj, pj, T, True, 1e-12, N_IT, N_IT, 0,
                        eff_lens=ej)
    jax.block_until_ready(out[0])
    _ = np.asarray(out[0][:8])
    print(f"classic first run (compile+{N_IT} it): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = em_mod.run_em(eqd, aj, pj, T, True, 1e-12, N_IT, N_IT, 0,
                        eff_lens=ej)
    _ = np.asarray(out[0][:8])
    dt2 = time.perf_counter() - t0
    print(f"classic: {N_IT} iters in {dt2:.3f}s -> "
          f"{N_IT / dt2:.1f} iters/s ({dt2 / N_IT * 1e3:.2f} ms/iter)",
          flush=True)
    print(f"speedup: {dt2 / dt:.1f}x", flush=True)

    # parity
    alpha_r = r["alphas"]
    alpha_c = np.asarray(out[0], np.float64)
    bad = np.abs(alpha_r - alpha_c) / np.maximum(alpha_c, 1.0)
    print(f"parity max rel diff (alpha>1): "
          f"{bad[alpha_c > 1].max():.2e}", flush=True)


if __name__ == "__main__":
    main()
