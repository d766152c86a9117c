"""ClusterForest-equivalent normalizeAlphas (inference/clusters.py) vs
the reference formulas (SalmonUtils.cpp:462-529, TranscriptCluster.hpp:
46-103) evaluated by hand / by a direct scalar re-implementation."""

import numpy as np

from salmon_tpu.inference.clusters import (cluster_ids, normalize_alphas,
                                           unique_total_counts)
from salmon_tpu.inference.eqclasses import PackedEqClasses


def _eq(label_sets, counts):
    labels = np.concatenate([np.asarray(s, np.int32) for s in label_sets])
    sizes = np.array([len(s) for s in label_sets], np.int32)
    offsets = np.zeros(len(label_sets) + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    weights = np.concatenate([np.full(len(s), 1.0 / len(s))
                              for s in label_sets])
    return PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                           counts=np.asarray(counts, np.float64),
                           class_sizes=sizes)


def _reference_scalar(eq, T, mass):
    """Direct scalar transcription of the reference math for testing."""
    uniq, total = unique_total_counts(eq, T)
    comp = cluster_ids(eq, T)
    projected = np.zeros(T)
    for c in np.unique(comp):
        members = np.where(comp == c)[0]
        cmass = mass[members].sum()
        ccount = 0.0
        for ci in range(eq.num_classes):
            lab = eq.labels[eq.offsets[ci]:eq.offsets[ci + 1]]
            if comp[lab[0]] == c:
                ccount += eq.counts[ci]
        req = False
        for t in members:
            if mass[t] <= 0 or cmass <= 0:
                projected[t] = 0.0
            else:
                projected[t] = mass[t] / cmass * ccount
                req |= (projected[t] > total[t]
                        or projected[t] < uniq[t])
        if len(members) > 1 and req:
            # eXpress projection loop (TranscriptCluster.hpp:46-103)
            bound = {t: False for t in members}
            for _ in range(5000):
                bsum = usum = 0.0
                for t in members:
                    if projected[t] > total[t]:
                        projected[t] = total[t]
                        bound[t] = True
                    elif projected[t] < uniq[t]:
                        projected[t] = uniq[t]
                        bound[t] = True
                    if bound[t]:
                        bsum += projected[t]
                    else:
                        usum += projected[t]
                if abs(bsum + usum - ccount) <= 0.375e-10:
                    break
                if usum == 0:
                    bound = {t: False for t in members}
                    usum, bsum = bsum, 0.0
                norm = (ccount - bsum) / usum
                for t in members:
                    if not bound[t]:
                        projected[t] *= norm
    return projected


def test_unique_total_counts():
    eq = _eq([[0], [0, 1], [1, 2], [2]], [10, 4, 6, 2])
    uniq, total = unique_total_counts(eq, 4)
    np.testing.assert_allclose(uniq, [10, 0, 2, 0])
    np.testing.assert_allclose(total, [14, 10, 8, 0])


def test_cluster_ids_partition():
    # {0,1,2} connected via classes; {3,4} separate; 5 untouched
    eq = _eq([[0, 1], [1, 2], [3, 4]], [1, 1, 1])
    comp = cluster_ids(eq, 6)
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4]
    assert len({int(comp[0]), int(comp[3]), int(comp[5])}) == 3


def test_hand_built_cluster_projection():
    """Two-transcript cluster where the mass-proportional share leaves
    the polytope: t0 uniquely covers 8 frags, shares 4 with t1 (total0
    = 12, uniq0 = 8; total1 = 4, uniq1 = 0; cluster count 12). Online
    mass puts 95% on t1 -> raw share (0.6, 11.4) violates total1 = 4;
    the projection clamps t1 to 4 and renormalizes t0 to 8."""
    eq = _eq([[0], [0, 1]], [8, 4])
    mass = np.array([0.05, 0.95])
    got = normalize_alphas(eq, 2, mass)
    np.testing.assert_allclose(got, [8.0, 4.0], rtol=1e-9)
    # matches the scalar transcription too
    np.testing.assert_allclose(got, _reference_scalar(eq, 2, mass),
                               rtol=1e-12)


def test_in_polytope_share_untouched():
    """When the proportional share already lies inside [uniq, total],
    no projection happens (requiresProjection stays false)."""
    eq = _eq([[0], [0, 1], [1]], [5, 10, 5])
    mass = np.array([0.5, 0.5])
    got = normalize_alphas(eq, 2, mass)
    np.testing.assert_allclose(got, [10.0, 10.0])


def test_zero_mass_member():
    """mass == 0 -> projectedCounts = 0 before projection
    (SalmonUtils.cpp:501-503)."""
    eq = _eq([[0, 1]], [6])
    mass = np.array([1.0, 0.0])
    got = normalize_alphas(eq, 2, mass)
    np.testing.assert_allclose(got, [6.0, 0.0])


def test_random_parity_with_scalar_reference():
    rng = np.random.default_rng(7)
    T = 40
    label_sets, counts = [], []
    for _ in range(60):
        s = rng.choice(T, size=int(rng.integers(1, 5)), replace=False)
        label_sets.append(np.sort(s))
        counts.append(float(rng.integers(1, 30)))
    eq = _eq(label_sets, counts)
    mass = rng.random(T) * rng.integers(0, 2, T)  # some zero-mass txps
    got = normalize_alphas(eq, T, mass)
    want = _reference_scalar(eq, T, mass)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    # every projected count lies in the polytope (up to fp wiggle)
    uniq, total = unique_total_counts(eq, T)
    assert (got <= total + 1e-6).all()
    # cluster totals are preserved
    comp = cluster_ids(eq, T)
    first = eq.labels[eq.offsets[:-1]]
    ncl = comp.max() + 1
    ccount = np.bincount(comp[first], eq.counts, minlength=ncl)
    csum = np.bincount(comp, got, minlength=ncl)
    live = ccount > 0
    np.testing.assert_allclose(csum[live], ccount[live], rtol=1e-6)
