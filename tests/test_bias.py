"""Bias model tests: SBModel VLMM mechanics, GC descriptors, positional
bins, expected pass, and the end-to-end bias-corrected quant."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from salmon_tpu.models import bias as B
from salmon_tpu.models import bias_expected as BE


def test_sb_context_indices_orders():
    # all-A context -> indices 0 everywhere
    z = np.zeros((1, 9), dtype=np.uint8)
    idx = np.asarray(B.sb_context_indices(jnp.asarray(z)))
    assert (idx == 0).all()
    # context ACGTACGTA: position i index packs bases i-order..i
    codes = np.array([[0, 1, 2, 3, 0, 1, 2, 3, 0]], dtype=np.uint8)
    idx = np.asarray(B.sb_context_indices(jnp.asarray(codes)))[0]
    assert idx[0] == 0                      # order 0: base A
    assert idx[1] == (0 << 2 | 1)           # order 1: AC
    assert idx[2] == (0 << 4 | 1 << 2 | 2)  # order 2: ACG
    assert idx[8] == (2 << 4 | 3 << 2 | 0)  # GTA


def test_sb_normalize_uniform():
    counts = np.ones((B.SB_ROWS, B.SB_CTX))
    logp = B.sb_normalize(counts)
    # every conditional distribution is uniform over 4 bases
    assert np.allclose(np.exp(logp[:4, 0]), 0.25)
    assert np.allclose(np.exp(logp[:16, 1]), 0.25)
    assert np.allclose(np.exp(logp[:64, 2]), 0.25)


def test_sb_normalize_sums_to_one():
    rng = np.random.default_rng(0)
    counts = rng.random((B.SB_ROWS, B.SB_CTX)) * 10
    logp = B.sb_normalize(counts)
    for i, o in enumerate(B.SB_ORDER):
        n = 4 ** (o + 1)
        p = np.exp(logp[:n, i]).reshape(-1, 4)
        np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-9)


def test_length_classes():
    lens = np.array([100, 200, 300, 400, 500, 600, 700, 800, 900, 1000])
    bounds = B.length_class_bounds(lens)
    assert bounds.shape == (5,)
    lc = np.asarray(B.length_class_of(jnp.asarray(lens),
                                      jnp.asarray(bounds)))
    assert lc.min() >= 0 and lc.max() <= 4
    assert (np.diff(lc) >= 0).all()  # monotone in length


def test_pos_project_weights_uniform():
    w = B.pos_project_weights(np.ones(20), 100)
    assert w.shape == (100,)
    np.testing.assert_allclose(w, w[0], rtol=0.2)  # roughly flat


def test_pos_project_knot_modes():
    """Parity mode reproduces the reference's bin->knot warp (defect #2
    of scripts/posbias_reference_trace.py): mass accumulated into
    uniform bin 5 (rel pos [0.25, 0.30)) projects with its peak at the
    Cufflinks knot 0.15-0.01=0.14. Corrected mode (--posBiasCorrected)
    puts the peak at the bin's actual center 0.275."""
    m = np.ones(20)
    m[5] = 200.0
    ref = B.pos_project_weights(m, 1000)
    cor = B.pos_project_weights(m, 1000, uniform_knots=True)
    peak_ref = np.argmax(ref) / 1000.0
    peak_cor = np.argmax(cor) / 1000.0
    assert abs(peak_ref - 0.14) < 0.02, peak_ref     # warped (parity)
    assert abs(peak_cor - 0.275) < 0.02, peak_cor    # aligned (fixed)


def test_pos_factor_grid_corrected_drops_rc():
    """--posBiasCorrected uses the fw marginal only (defect #1: fw x rc
    double count); parity mode keeps both factor grids."""
    from salmon_tpu.models.bias_correct import _pos_factor_grid

    rng = np.random.default_rng(0)
    obs = rng.random((B.POS_LENGTH_CLASSES, B.POS_BINS)) * 50
    exp = rng.random((B.POS_LENGTH_CLASSES, B.POS_BINS)) * 50
    g_par = _pos_factor_grid(obs, exp)
    g_cor = _pos_factor_grid(obs, exp, uniform_knots=True)
    assert g_par.shape == g_cor.shape
    assert not np.allclose(g_par, g_cor)  # knot placement differs


def test_gc_desc_known_sequence():
    # transcript: 10 A's then 10 G's
    class FakeIdx:
        seq_codes = np.array([0] * 10 + [2] * 10, dtype=np.uint8)
        seq_offsets = np.array([0, 20], dtype=np.int64)
        lengths = np.array([20], dtype=np.int32)
        num_valid_targets = 1

        def transcript_codes(self, i):
            return self.seq_codes

    bdev = B.bias_device_arrays(FakeIdx())
    frag_bin, cond_bin, valid = B._gc_desc(
        bdev, jnp.asarray([0]), jnp.asarray([5]), jnp.asarray([14]))
    # fragment covers positions 5..14: 5 A's, 5 G's -> 50% GC
    assert int(frag_bin[0]) == 50
    assert bool(valid[0])


def test_expected_pass_shapes(sample_data_dir):
    from salmon_tpu.index.builder import build_index
    idx = build_index(os.path.join(sample_data_dir, "transcripts.fasta"),
                      k=25)
    n = idx.num_valid_targets
    buckets = BE.bucket_transcripts(idx.transcript_codes, idx.lengths[:n])
    pmf = np.zeros(1001)
    pmf[150:251] = 1 / 101.0
    cdf = jnp.asarray(np.cumsum(pmf), jnp.float32)
    lo, hi = BE.fld_quantile_bounds(pmf)
    assert 150 <= lo < hi <= 251
    idxs, mat = buckets[0]
    out = BE.expected_pass_bucket(
        jnp.asarray(mat), jnp.asarray(idx.lengths[idxs].astype(np.int32)),
        jnp.ones(len(idxs), jnp.float32),
        jnp.zeros(len(idxs), jnp.int32), cdf, lo, hi, 5,
        True, True, True)
    assert out["exp5"].shape == (64, 9)
    assert float(jnp.sum(out["exp5"])) > 0
    assert out["gc_exp"].shape == (3, 101)
    assert float(jnp.sum(out["gc_exp"])) > 0
    assert out["pos5"].shape == (5, 20)


def test_quant_with_bias_end_to_end(tmp_path, sample_data_dir):
    """--seqBias --gcBias --posBias must still produce accurate counts."""
    from salmon_tpu.cli import main
    from salmon_tpu.io.writers import read_quant_sf
    import collections

    idx_dir = str(tmp_path / "idx")
    assert main(["index", "-t",
                 os.path.join(sample_data_dir, "transcripts.fasta"),
                 "-i", idx_dir, "-k", "25"]) == 0
    truth = collections.Counter()
    with open(os.path.join(sample_data_dir, "reads_1.fastq")) as fh:
        for i, line in enumerate(fh):
            if i % 4 == 0:
                truth[line[1:].split(":")[1]] += 1

    def run(out, *flags):
        assert main(["quant", "-i", idx_dir, "-l", "IU",
                     "-1", os.path.join(sample_data_dir, "reads_1.fastq"),
                     "-2", os.path.join(sample_data_dir, "reads_2.fastq"),
                     "-o", out, *flags, "-q"]) == 0
        q = read_quant_sf(os.path.join(out, "quant.sf"))
        est = dict(zip(q["Name"], q["NumReads"]))
        t = np.array([truth[k] for k in truth], dtype=float)
        e = np.array([est.get(k, 0.0) for k in truth])
        from scipy.stats import spearmanr
        return spearmanr(t, e).statistic

    # the common production combo must stay accurate on unbiased sim data
    out = str(tmp_path / "q_sg")
    rho = run(out, "--seqBias", "--gcBias")
    assert rho >= 0.99, f"seq+gc bias Spearman {rho}"
    for f in ("obs5_seq.gz", "exp5_seq.gz", "obs_gc.gz", "exp_gc.gz"):
        assert os.path.exists(os.path.join(out, "aux_info", f)), f
    from salmon_tpu.io.writers import read_matrix_gz
    m = read_matrix_gz(os.path.join(out, "aux_info", "obs5_seq.gz"))
    assert m.shape == (64, 9)
    assert m.sum() > 0

    # positional bias on a 10k-read sample is noise-dominated (5 quantile
    # classes x 20 bins, spline-extrapolated tails); gate is structural:
    # runs, writes dumps, stays correlated. TODO: validate correction
    # gain on a positionally-biased large simulation.
    out_p = str(tmp_path / "q_pos")
    rho_p = run(out_p, "--posBias")
    assert rho_p >= 0.80, f"pos-bias Spearman {rho_p}"
    for f in ("obs5_pos.gz", "exp5_pos.gz"):
        assert os.path.exists(os.path.join(out_p, "aux_info", f)), f


def test_gc_fold_expand_roundtrip():
    """--numGCBins re-binning: percent-resolution masses fold into the
    n-bin model exactly as GCDesc::fragBin(n) would bin each percent,
    and the expanded ratio reads each percent's bin."""
    from salmon_tpu.models.bias_correct import (expand_gc_ratio,
                                                fold_gc_counts, _gc_ratio)
    rng = np.random.default_rng(0)
    obs = rng.random((3, 101))
    exp = rng.random((3, 101))
    for n in (25, 101, 10):
        fo = fold_gc_counts(obs, n, 3)
        assert fo.shape == (3, n)
        assert fo.sum() == pytest.approx(obs.sum())
        # percent p lands in bin min(n-1, floor(p/(100/n)))
        for p in (0, 37, 99, 100):
            b = min(n - 1, int(p / (100.0 / n)))
            assert fo[0, b] >= obs[0, p] - 1e-12 or n == 101
        r = expand_gc_ratio(_gc_ratio(fo, fold_gc_counts(exp, n, 3)),
                            n, 3)
        assert r.shape == (3, 101)
    # conditional collapse (gcBias without seqBias)
    f1 = fold_gc_counts(obs, 25, 1)
    assert f1.shape == (1, 25)
    r1 = expand_gc_ratio(_gc_ratio(f1, fold_gc_counts(exp, 25, 1)), 25, 1)
    assert r1.shape == (3, 101)
    assert np.allclose(r1[0], r1[2])
    # identity at 101 bins / 3 cond: fold is a no-op
    np.testing.assert_allclose(fold_gc_counts(obs, 101, 3), obs)


def test_pos_efflen_matches_bruteforce():
    """Pin pass-2 positional semantics: the jitted bucket pass must equal
    the reference formula sum_fl flW(fl) * sum_s posFW(s/L) * posRC(e/L)
    (SalmonUtils.cpp:1700-1760, positional factors only) computed as a
    brute-force numpy double loop over the same projected grids."""
    rng = np.random.default_rng(3)
    lens = np.array([240, 480, 500, 333], dtype=np.int32)
    Bn, L = lens.shape[0], 512
    codes = np.full((Bn, L), 4, dtype=np.uint8)
    for r, ln in enumerate(lens):
        codes[r, :ln] = rng.integers(0, 4, ln)

    pmf = np.zeros(401)
    pmf[120:221] = np.exp(-0.5 * ((np.arange(120, 221) - 170) / 20.0) ** 2)
    pmf /= pmf.sum()
    cdf_np = np.cumsum(pmf)
    fld_low, fld_high = BE.fld_quantile_bounds(pmf)
    gc_samp = 3

    # non-trivial factor grids (5, POS_GRID), distinct fw/rc shapes
    g = np.linspace(0.0, 1.0, BE.POS_GRID)
    grid_fw = np.stack([np.exp(-(0.3 + 0.2 * li) * g)
                        for li in range(B.POS_LENGTH_CLASSES)])
    grid_rc = np.stack([1.0 + 0.5 * np.sin(2 * np.pi * g + li)
                        for li in range(B.POS_LENGTH_CLASSES)])
    len_class = np.array([0, 2, 2, 4], dtype=np.int32)
    eff_in = lens.astype(np.float64) - 170.0

    ones = np.zeros((B.SB_ROWS, B.SB_CTX), np.float32)
    eff_dev = np.asarray(BE.efflen_pass_bucket(
        jnp.asarray(codes), jnp.asarray(lens),
        jnp.asarray(eff_in, jnp.float32),
        jnp.ones(Bn, bool), jnp.asarray(len_class),
        jnp.asarray(cdf_np, jnp.float32), fld_low, fld_high, gc_samp,
        jnp.asarray(ones), jnp.asarray(ones), jnp.asarray(ones),
        jnp.asarray(ones), jnp.ones((3, 101), jnp.float32),
        jnp.asarray(grid_fw, jnp.float32), jnp.asarray(grid_rc, jnp.float32),
        seq_bias=False, gc_bias=False, pos_bias=True))

    for r in range(Bn):
        Ln = int(lens[r])
        li = int(len_class[r])
        max_arg = min(cdf_np.shape[0] - 1, Ln)
        max_val = cdf_np[max_arg]

        def ccdf(x):
            if x > max_arg:
                return 1.0
            return cdf_np[max(0, min(x, cdf_np.shape[0] - 1))] / max_val

        frac = (np.arange(Ln) / Ln * BE.POS_GRID).astype(int)
        frac = np.clip(frac, 0, BE.POS_GRID - 1)
        pfw = grid_fw[li][frac]
        prc = grid_rc[li][frac]
        eff = 0.0
        fl = fld_low
        while fl <= fld_low + ((fld_high - fld_low) // gc_samp) * gc_samp:
            fl_w = ccdf(fl) - ccdf(fl - gc_samp)
            inner = 0.0
            for s in range(Ln - fl + 1):
                inner += pfw[s] * prc[s + fl - 1]
            eff += fl_w * inner
            fl += gc_samp
        barrier = max(eff, min(eff_in[r], max(1.0, Ln - eff_in[r])))
        assert eff_dev[r] == pytest.approx(barrier, rel=2e-3), (
            f"row {r}: device {eff_dev[r]} vs bruteforce {barrier}")
