"""Steady-state marginal cost of the sort-routed EM at the
metric-of-record fixture (250k txps / ~1M entries).

Method (backend measurement gospel): per-call overhead on this backend
is ~26ms (dispatch + transfers), so iters/s from a single call
understates the engine. Marginal cost = (T(n2) - T(n1)) / (n2 - n1)
between two warmed fixed-trip-count runs.
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    from salmon_tpu.inference import em as em_mod
    from salmon_tpu.inference import fastem
    from salmon_tpu.inference.eqclasses import PackedEqClasses

    rng = np.random.default_rng(0)
    T = 250_000
    NCLS = 250_000
    sizes = np.minimum(1 + rng.geometric(0.35, NCLS), 50).astype(np.int32)
    seg = np.repeat(np.arange(NCLS), sizes)
    E = int(sizes.sum())
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
    a0 = em_mod.initial_alphas(T, None, eq.num_fragments)
    pri = em_mod.prior_alphas(T, eff, 1e-2, True)
    t0 = time.perf_counter()
    packed = fastem.pack_routed(eq, T, eff)
    print(f"pack_routed: {time.perf_counter() - t0:.2f}s "
          f"(E={E}, s_c={packed.s_c}, s_l={packed.s_l}, "
          f"n_route={packed.n_route})", flush=True)

    def run(n):
        return fastem.optimize_routed(eq, T, eff, a0, pri, True, 1e-12,
                                      n, n, packed=packed)

    times = {}
    for n in (50, 250):
        run(n)              # compile + warm this trip count
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(n)
            ts.append(time.perf_counter() - t0)
        times[n] = float(np.median(ts))
        print(f"n={n}: {times[n]*1e3:.1f} ms "
              f"({n/times[n]:.1f} iters/s incl overhead)", flush=True)
    marg = (times[250] - times[50]) / 200
    print(f"marginal: {marg*1e3:.2f} ms/iter -> {1/marg:.0f} iters/s "
          f"steady-state", flush=True)


if __name__ == "__main__":
    main()
