"""Gibbs sampler and bootstrap tests against analytic expectations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salmon_tpu.inference import sampling
from salmon_tpu.inference.eqclasses import PackedEqClasses


def _toy_eq():
    """3 transcripts: class {0} c=100, class {1,2} c=200 (equal aux),
    class {0,1} c=50."""
    labels = np.array([0, 1, 2, 0, 1], dtype=np.int32)
    weights = np.array([1.0, 0.5, 0.5, 0.5, 0.5])
    offsets = np.array([0, 1, 3, 5], dtype=np.int64)
    counts = np.array([100.0, 200.0, 50.0])
    sizes = np.array([1, 2, 2], dtype=np.int32)
    return PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                           counts=counts, class_sizes=sizes)


def _make_eq(label_sets, counts):
    labels = np.concatenate([np.asarray(s, np.int32) for s in label_sets])
    sizes = np.array([len(s) for s in label_sets], np.int32)
    offsets = np.zeros(len(label_sets) + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    weights = np.concatenate([np.full(len(s), 1.0 / len(s))
                              for s in label_sets])
    return PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                           counts=np.asarray(counts, np.float64),
                           class_sizes=sizes)


def test_multinomial_rows_marginals():
    key = jax.random.PRNGKey(0)
    probs = jnp.asarray([[0.5, 0.3, 0.2], [0.1, 0.1, 0.8]])
    mask = jnp.ones((2, 3), bool)
    n = jnp.asarray([1000.0, 1000.0])
    draws = []
    for i in range(200):
        k = jax.random.fold_in(key, i)
        draws.append(np.asarray(sampling.multinomial_rows(k, n, probs,
                                                          mask)))
    d = np.stack(draws)
    # every draw conserves the total
    np.testing.assert_array_equal(d.sum(axis=2), 1000.0)
    mean = d.mean(axis=0)
    np.testing.assert_allclose(mean[0], [500, 300, 200], rtol=0.05)
    np.testing.assert_allclose(mean[1], [100, 100, 800], rtol=0.07)


def test_multinomial_rows_masked_slots():
    key = jax.random.PRNGKey(1)
    probs = jnp.asarray([[0.5, 0.5, 0.5]])
    mask = jnp.asarray([[True, True, False]])
    d = np.asarray(sampling.multinomial_rows(
        key, jnp.asarray([100.0]), probs, mask))
    assert d[0, 2] == 0.0
    assert d.sum() == 100.0


def test_gibbs_conserves_counts_and_centers():
    eq = _toy_eq()
    eff = np.array([100.0, 100.0, 100.0])
    init = np.array([125.0, 150.0, 75.0])
    s = sampling.gibbs_samples(eq, 3, eff, init, num_samples=40,
                               thinning=4, prior=1e-3, seed=3)
    assert s.shape == (40, 3)
    # every sample redistributes exactly the 350 fragments
    np.testing.assert_allclose(s.sum(axis=1), 350.0, rtol=1e-6)
    # txp0 gets >= its unique class count, txp1+txp2 >= 200
    assert (s[:, 0] >= 100 - 1e-6).all()
    assert (s[:, 1] + s[:, 2] >= 200 - 1e-6).all()


def test_gibbs_no_gamma_draw_low_variance():
    eq = _toy_eq()
    eff = np.array([100.0, 100.0, 100.0])
    init = np.array([125.0, 150.0, 75.0])
    s_g = sampling.gibbs_samples(eq, 3, eff, init, num_samples=30,
                                 thinning=4, seed=5)
    s_p = sampling.gibbs_samples(eq, 3, eff, init, num_samples=30,
                                 thinning=4, no_gamma_draw=True, seed=5)
    # point-mass mu (noGammaDraw) removes shot noise -> lower variance
    assert s_p[:, 1].std() <= s_g[:, 1].std() * 1.5


def test_bootstrap_shapes_and_totals():
    eq = _toy_eq()
    eff = np.array([100.0, 100.0, 100.0])
    b = sampling.bootstrap_samples(eq, 3, eff, num_boot=16,
                                   use_vbem=False, vb_prior=1e-2,
                                   per_transcript_prior=True, seed=11)
    assert b.shape == (16, 3)
    # each replicate assigns ~total fragments (multinomial total conserved)
    np.testing.assert_allclose(b.sum(axis=1), 350.0, rtol=0.01)
    # replicates differ (resampling actually happened)
    assert np.std(b[:, 1]) > 0


def test_gibbs_routed_matches_dense():
    """The routed Gibbs engine must agree with the dense engine in
    distribution (same posterior means within MC noise) on a mid-size
    random fixture."""
    rng = np.random.default_rng(9)
    T, NCLS = 150, 300
    sizes = np.minimum(1 + rng.geometric(0.45, NCLS), 6).astype(np.int32)
    E = int(sizes.sum())
    seg = np.repeat(np.arange(NCLS), sizes)
    labels = rng.integers(0, T, E).astype(np.int32)
    w = rng.random(E)
    wsum = np.bincount(seg, weights=w, minlength=NCLS)
    weights = w / wsum[seg]
    counts = rng.integers(1, 25, NCLS).astype(np.float64)
    offsets = np.zeros(NCLS + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    eq = PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                         counts=counts, class_sizes=sizes)
    eff = np.full(T, 120.0)
    init = np.bincount(labels, weights=counts[seg] * weights,
                       minlength=T)
    kw = dict(thinning=4, prior=1e-3, no_gamma_draw=False)
    gd = sampling.gibbs_samples(eq, T, eff, init, 64, seed=21, **kw)
    gr = sampling.gibbs_samples_routed(eq, T, eff, init, 64, seed=21,
                                       **kw)
    total = counts.sum()
    np.testing.assert_allclose(gd.sum(axis=1), total, rtol=1e-4)
    np.testing.assert_allclose(gr.sum(axis=1), total, rtol=1e-4)
    md, mr = gd.mean(axis=0), gr.mean(axis=0)
    from scipy.stats import spearmanr
    assert spearmanr(md, mr).statistic > 0.97
    big = md > 5.0
    se = gd.std(axis=0) / 8 + gr.std(axis=0) / 8
    assert np.abs(md[big] - mr[big]).max() <= (4 * se[big]
                                               + 0.08 * md[big]).max()


def test_bootstrap_routed_matches_dense():
    """The sort-routed bootstrap engine (at-scale path) must agree with
    the dense vmapped engine in distribution: same per-transcript means
    within resampling noise on a mid-size random fixture, and totals
    conserved."""
    rng = np.random.default_rng(3)
    T, NCLS = 200, 400
    sizes = np.minimum(1 + rng.geometric(0.4, NCLS), 8).astype(np.int32)
    E = int(sizes.sum())
    seg = np.repeat(np.arange(NCLS), sizes)
    labels = rng.integers(0, T, E).astype(np.int32)
    w = rng.random(E)
    wsum = np.bincount(seg, weights=w, minlength=NCLS)
    weights = w / wsum[seg]
    counts = rng.integers(1, 30, NCLS).astype(np.float64)
    offsets = np.zeros(NCLS + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    eq = PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                         counts=counts, class_sizes=sizes)
    eff = np.full(T, 150.0)
    kw = dict(use_vbem=True, vb_prior=1e-2, per_transcript_prior=True,
              max_iter=300)
    bd = sampling.bootstrap_samples(eq, T, eff, 24, seed=5, **kw)
    br = sampling.bootstrap_samples_routed(eq, T, eff, 24, seed=5, **kw)
    total = counts.sum()
    np.testing.assert_allclose(bd.sum(axis=1), total, rtol=0.01)
    np.testing.assert_allclose(br.sum(axis=1), total, rtol=0.01)
    md, mr = bd.mean(axis=0), br.mean(axis=0)
    sd = bd.std(axis=0) / np.sqrt(24) + br.std(axis=0) / np.sqrt(24)
    big = md > 5.0
    assert np.abs(md[big] - mr[big]).max() <= (4 * sd[big]
                                               + 0.05 * md[big]).max()
    from scipy.stats import spearmanr
    assert spearmanr(md, mr).statistic > 0.98


def test_bootstrap_vbem_runs():
    eq = _toy_eq()
    eff = np.array([100.0, 100.0, 100.0])
    b = sampling.bootstrap_samples(eq, 3, eff, num_boot=4,
                                   use_vbem=True, vb_prior=1e-2,
                                   per_transcript_prior=True, seed=13)
    assert np.isfinite(b).all()
    assert (b >= 0).all()


def test_cli_gibbs_outputs(tmp_path, sample_data_dir):
    import os
    from salmon_tpu.cli import main
    from salmon_tpu.io.writers import read_bootstraps

    idx = str(tmp_path / "idx")
    assert main(["index", "-t",
                 os.path.join(sample_data_dir, "transcripts.fasta"),
                 "-i", idx, "-k", "25"]) == 0
    out = str(tmp_path / "q")
    assert main(["quant", "-i", idx, "-l", "IU",
                 "-1", os.path.join(sample_data_dir, "reads_1.fastq"),
                 "-2", os.path.join(sample_data_dir, "reads_2.fastq"),
                 "-o", out, "--numGibbsSamples", "8", "-q"]) == 0
    names, samples = read_bootstraps(out)
    assert samples.shape[0] == 8
    assert len(names) == 15
    assert (samples.sum(axis=1) > 0).all()


def test_gibbs_deep_class_exact_totals():
    """A class deeper than 2^24 fragments must produce EXACTLY
    conserved totals (the f32 conditional-binomial bound is avoided by
    equal-distribution class chunking + int32 accumulation)."""
    n_deep = (1 << 24) + 3            # odd and beyond exact-f32 range
    eq = _make_eq([[0, 1], [2]], [n_deep, 5])
    eff = np.array([300.0, 300.0, 300.0])
    init = np.array([n_deep / 2, n_deep / 2, 5.0])
    s = sampling.gibbs_samples(eq, 3, eff, init, num_samples=3,
                               thinning=2, seed=11)
    totals = s.sum(axis=1)
    np.testing.assert_array_equal(totals, float(n_deep + 5))
    # both chunked halves land on the two members only
    assert (s[:, 2] == 5).all()


def test_split_deep_classes_identity_when_shallow():
    eq = _make_eq([[0, 1], [2]], [10, 5])
    assert sampling.split_deep_classes(eq) is eq


def test_split_deep_classes_chunks():
    cap = 100
    eq = _make_eq([[0, 1], [2]], [250, 5])
    sp = sampling.split_deep_classes(eq, cap=cap)
    assert sp.num_classes == 4            # 100+100+50, 5
    np.testing.assert_allclose(sorted(sp.counts), [5, 50, 100, 100])
    assert float(sp.counts.sum()) == 255.0
    # labels/weights replicated per chunk
    assert sp.labels.shape[0] == 2 * 3 + 1
