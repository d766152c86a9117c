"""The automated accuracy gate: perf work cannot land if this drifts.

Two pins, mirroring the reference's accuracy yardstick
(tests/test_quant.nf:38-67 + scripts/test_sim_corr.py:18-36 — TPM
Pearson/Spearman vs simulation truth) at CI scale:

1. end-to-end TPM Spearman >= 0.999 and mapping rate >= 0.999 on a
   seeded mixed simulation (unique transcripts + shared-5'-block
   isoform families whose reads the EM must apportion), and
2. the sort-routed EM engine vs the float64 numpy engine at ~1M
   entries (the at-scale engine-swap cross-check).
"""

import os
import tempfile

import numpy as np
import pytest

from salmon_tpu.constants import SalmonDefaults
from salmon_tpu.utils.dna import decode_seq, revcomp_codes

READ_LEN = 100
N_PAIRS = 30_000
ERR = 0.005


@pytest.fixture(scope="module")
def mixed_sim(tmp_path_factory):
    rng = np.random.default_rng(123)
    d = tmp_path_factory.mktemp("acc_gate")
    seqs = []
    # 280 unique transcripts
    for _ in range(280):
        seqs.append(rng.integers(
            0, 4, int(rng.integers(500, 3000))).astype(np.uint8))
    # 10 two-isoform families: shared 5' block + isoform-unique 3'
    # block longer than any fragment -> statistically resolvable, so a
    # correct EM recovers the split and any weighting drift shows up
    for _ in range(10):
        shared = rng.integers(
            0, 4, int(rng.integers(400, 900))).astype(np.uint8)
        for _i in range(2):
            uniq = rng.integers(
                0, 4, int(rng.integers(500, 900))).astype(np.uint8)
            seqs.append(np.concatenate([shared, uniq]))
    names = [f"TX{i:04d}" for i in range(len(seqs))]
    fa = str(d / "t.fa")
    with open(fa, "w") as fh:
        for nm, s in zip(names, seqs):
            fh.write(f">{nm}\n{decode_seq(s)}\n")
    expr = rng.gamma(0.5, 1.0, len(seqs))
    expr[rng.random(len(seqs)) < 0.15] = 0.0
    lens = np.array([s.shape[0] for s in seqs], float)
    w = expr * np.maximum(lens - 250, 1)
    p = w / w.sum()
    truth = np.zeros(len(seqs))
    r1p, r2p = str(d / "r1.fq"), str(d / "r2.fq")
    with open(r1p, "w") as f1, open(r2p, "w") as f2:
        for i in range(N_PAIRS):
            t = int(rng.choice(len(seqs), p=p))
            L = seqs[t].shape[0]
            fl = int(np.clip(rng.normal(250, 25), 2 * READ_LEN, L))
            fl = min(fl, L)
            s0 = int(rng.integers(0, L - fl + 1))
            truth[t] += 1
            left = seqs[t][s0:s0 + READ_LEN].copy()
            right = revcomp_codes(
                seqs[t][s0 + fl - READ_LEN:s0 + fl]).copy()
            for r in (left, right):
                m = rng.random(READ_LEN) < ERR
                r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
            f1.write(f"@s{i}\n{decode_seq(left)}\n+\n{'I' * READ_LEN}\n")
            f2.write(f"@s{i}\n{decode_seq(right)}\n+\n"
                     f"{'I' * READ_LEN}\n")
    return {"fa": fa, "r1": r1p, "r2": r2p, "truth": truth,
            "names": names}


@pytest.mark.slow
def test_tpm_spearman_and_mapping_rate_gate(mixed_sim):
    """Measured headroom at gate commit: Spearman 0.99985, mapping
    rate 1.0, family median rel err 0.008 (defaults, dense seed flow).
    The pins leave drift room for float noise, none for regressions."""
    from scipy.stats import spearmanr

    from salmon_tpu.index.builder import build_index
    from salmon_tpu.quant import quantify

    idx = build_index(mixed_sim["fa"], k=31)
    r = quantify(idx, "IU", [mixed_sim["r1"]], [mixed_sim["r2"]],
                 opts=SalmonDefaults(), progress=False)
    rate = r.num_mapped / r.num_processed
    assert rate >= 0.999, f"mapping rate {rate}"

    names = mixed_sim["names"]
    truth = mixed_sim["truth"]
    est = dict(zip(r.names, r.counts))
    e = np.array([est.get(nm, 0.0) for nm in names])
    eff = dict(zip(r.names, r.eff_lens))
    el = np.array([max(eff.get(nm, 1.0), 1.0) for nm in names])
    t_tpm = truth / el
    t_tpm = t_tpm / t_tpm.sum() * 1e6
    e_tpm = np.array([dict(zip(r.names, r.tpm)).get(nm, 0.0)
                      for nm in names])
    rho = spearmanr(t_tpm, e_tpm).statistic
    # BASELINE's own acceptance bar (TPM Spearman >= 0.999 vs truth);
    # measured headroom 0.99985 at the r5 gate bump
    assert rho >= 0.999, f"TPM Spearman {rho}"
    rho_c = spearmanr(truth, e).statistic
    assert rho_c >= 0.999, f"counts Spearman {rho_c}"
    # isoform families: the EM must recover the within-family split
    fam = np.arange(280, 300)
    ft, fe = truth[fam], e[fam]
    good = ft >= 30
    rel = np.abs(fe[good] - ft[good]) / ft[good]
    assert float(np.median(rel)) <= 0.05, float(np.median(rel))


@pytest.mark.slow
def test_paralog_gate(tmp_path):
    """Repeat-heavy / paralog-rich gate (VERDICT r3 next #3): 6 families
    of 10-50 near-identical members (k-mer multiplicities far past
    occ_cap) + tandem-repeat transcripts. Gates the occ_cap /
    weight_width / stride speed knobs the easy mixed sim cannot see.

    Calibration sweep (scripts/sim_paralog_gate.py, seeded, aligned CSR,
    2026-08-20):
        occ_cap=8  W=16 (default): rho_all 0.709, fam0_rho 1.000
        occ_cap=6  W=16:           rho_all 0.678, fam0_rho 0.806
        occ_cap=4  W=16:           rho_all 0.655, fam0_rho 0.261
    The pins pass at the defaults and FAIL at occ_cap<=6 — further
    cap-tightening must buy its throughput elsewhere.
    Reference bar: the GRCh37 sim yardstick (tests/test_quant.nf:38-67)
    at reference-default maxReadOccs=200 (SalmonDefaults.hpp:64), which
    never truncates at these multiplicities."""
    import sys

    from scipy.stats import spearmanr

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.sim_paralog_gate import build_sim, metrics

    from salmon_tpu.index.builder import build_index
    from salmon_tpu.quant import quantify

    sim = build_sim(str(tmp_path))
    idx = build_index(sim["fa"], k=31)
    res = quantify(idx, "IU", [sim["r1"]], [sim["r2"]],
                   opts=SalmonDefaults(), progress=False)
    m = metrics(sim, res)
    assert m["mapping_rate"] >= 0.995, m
    assert m["spearman_all"] >= 0.69, m
    # the 10-member family resolves perfectly at the default cap and
    # collapses (rho 0.26) at occ_cap=4 — the sharpest truncation signal
    assert m["fam_member_spearman"][0] >= 0.9, m
    assert m["fam_total_relerr_max"] <= 0.01, m
    assert m["rep_relerr_max"] <= 0.15, m


@pytest.mark.slow
def test_routed_em_matches_f64_at_scale():
    """Sort-routed engine vs float64 numpy at ~1M entries / 250k txps
    (the engine the bench and human-scale runs actually exercise)."""
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
    eff = np.maximum(rng.random(T) * 2000, 25.0)

    cfg = em_mod.EMConfig(use_vbem=True, min_iterations=60,
                          max_iterations=60)
    ref = em_mod.em_numpy(eq, T, eff, config=cfg)
    a0 = em_mod.initial_alphas(T, None, eq.num_fragments)
    pri = em_mod.prior_alphas(T, eff, 1e-2, True)
    got = fastem.optimize_routed(eq, T, eff, a0, pri, True, 1e-12,
                                 60, 60)
    ga, ra = np.asarray(got["alphas"]), np.asarray(ref["alphas"])
    assert ga.shape == ra.shape
    total = counts.sum()
    # identical fixed-trip iteration counts -> the engines must agree
    # to f32 accumulation noise on every materially-expressed txp
    np.testing.assert_allclose(ga.sum(), ra.sum(), rtol=1e-4)
    big = ra > 1.0
    rel = np.abs(ga[big] - ra[big]) / ra[big]
    assert float(np.quantile(rel, 0.99)) < 0.02, (
        float(np.quantile(rel, 0.99)))
    assert float(np.abs(ga - ra).sum()) / total < 0.01
