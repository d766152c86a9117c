"""Sort-routed EM parity vs the float64 numpy engine and run_em."""

import numpy as np
import pytest

from salmon_tpu.inference import em as em_mod
from salmon_tpu.inference.eqclasses import PackedEqClasses
from salmon_tpu.inference import fastem


def _random_eq(seed, T=500, NCLS=800, max_size=12, with_singletons=True):
    rng = np.random.default_rng(seed)
    sizes = rng.integers(1 if with_singletons else 2, max_size + 1,
                         NCLS).astype(np.int32)
    labels = []
    for s in sizes:
        labels.append(rng.choice(T, size=s, replace=False))
    labels = np.concatenate(labels).astype(np.int32)
    E = labels.shape[0]
    weights = rng.random(E)
    # normalize weights within class (aux probs)
    seg = np.repeat(np.arange(NCLS), sizes)
    wsum = np.bincount(seg, weights=weights, minlength=NCLS)
    weights = weights / wsum[seg]
    counts = rng.integers(1, 50, NCLS).astype(np.float64)
    offsets = np.zeros(NCLS + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    return PackedEqClasses(labels=labels, weights=weights,
                           offsets=offsets, counts=counts,
                           class_sizes=sizes)


@pytest.mark.parametrize("use_vbem", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_routed_matches_numpy(use_vbem, seed):
    T = 500
    eq = _random_eq(seed, T=T)
    eff = np.maximum(np.random.default_rng(99).random(T) * 2000, 25.0)
    cfgn = em_mod.EMConfig(use_vbem=use_vbem, min_iterations=40,
                           max_iterations=200)
    ref = em_mod.em_numpy(eq, T, eff, config=cfgn)

    total = eq.num_fragments
    a0 = em_mod.initial_alphas(T, None, total)
    pri = em_mod.prior_alphas(T, eff, 1e-2, True)
    got = fastem.optimize_routed(
        eq, T, eff, a0, pri, use_vbem, cfgn.rel_diff_tolerance,
        40, 200)
    # chunked convergence checks every EM_CHUNK iterations, so the
    # routed engine may overshoot the reference's per-iteration stop by
    # up to EM_CHUNK-1 extra (fixpoint-tightening) iterations
    assert ref["iterations"] <= got["iterations"] \
        < ref["iterations"] + fastem.EM_CHUNK
    # numeric parity at MATCHED iteration count
    cfg_same = em_mod.EMConfig(
        use_vbem=use_vbem, min_iterations=got["iterations"],
        max_iterations=got["iterations"])
    ref_same = em_mod.em_numpy(eq, T, eff, config=cfg_same)
    np.testing.assert_allclose(got["alphas"], ref_same["alphas"],
                               rtol=2e-3, atol=2e-2)
    # mass conservation
    assert got["alphas"].sum() == pytest.approx(total, rel=1e-3)


def test_routed_degenerate_and_absent():
    """Classes with ~zero combined weight drop; txps in no class get 0."""
    T = 50
    labels = np.array([0, 1, 2, 3, 4, 5], np.int32)
    sizes = np.array([2, 2, 2], np.int32)
    weights = np.array([0.5, 0.5, 0.5, 0.5, 0.5, 0.5])
    counts = np.array([10.0, 20.0, 30.0])
    offsets = np.array([0, 2, 4, 6], np.int64)
    eq = PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                         counts=counts, class_sizes=sizes)
    eff = np.full(T, 100.0)
    a0 = np.full(T, 1.0)
    # kill class 1 by zeroing its members' initial alphas
    a0[2] = a0[3] = 0.0
    pri = np.full(T, 1e-2)
    got = fastem.optimize_routed(eq, T, eff, a0, pri, False, 0.01, 5, 50)
    assert got["num_degenerate_classes"] == 1
    assert got["alphas"][2] == 0 and got["alphas"][3] == 0
    assert got["alphas"][:2].sum() == pytest.approx(10.0, rel=1e-4)
    assert got["alphas"][4:6].sum() == pytest.approx(30.0, rel=1e-4)
    assert (got["alphas"][6:] == 0).all()


def test_routed_singletons():
    T = 10
    labels = np.array([3, 0, 1], np.int32)
    sizes = np.array([1, 2], np.int32)
    weights = np.array([1.0, 0.5, 0.5])
    counts = np.array([7.0, 4.0])
    offsets = np.array([0, 1, 3], np.int64)
    eq = PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                         counts=counts, class_sizes=sizes)
    eff = np.full(T, 100.0)
    a0 = np.full(T, 1.0)
    pri = np.full(T, 1e-2)
    got = fastem.optimize_routed(eq, T, eff, a0, pri, False, 0.01, 5, 50)
    assert got["alphas"][3] == pytest.approx(7.0, rel=1e-5)
    assert got["alphas"][0] + got["alphas"][1] == pytest.approx(
        4.0, rel=1e-4)
