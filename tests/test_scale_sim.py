"""Scale + error-robustness simulation: a few hundred synthetic
transcripts, reads with realistic substitution errors, accuracy gates.

This exercises what the error-free 15-transcript sample cannot: DP
validation under mismatches, eq classes over many transcripts, decoy
filtering, and index build at a few-Mb scale.
"""

import numpy as np
import pytest

from salmon_tpu.constants import SalmonDefaults
from salmon_tpu.index.builder import build_index
from salmon_tpu.quant import quantify
from salmon_tpu.utils.dna import decode_seq, revcomp_codes


N_TXP = 300
READ_LEN = 100
N_PAIRS = 8000
ERR = 0.01


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    rng = np.random.default_rng(42)
    d = tmp_path_factory.mktemp("sim")
    # transcripts 400-3000bp; a handful of near-duplicates (paralogs)
    seqs = []
    for i in range(N_TXP):
        L = int(rng.integers(400, 3000))
        seqs.append(rng.integers(0, 4, L).astype(np.uint8))
    for i in range(10):  # paralogs: 2% diverged copies
        src = seqs[i].copy()
        m = rng.random(src.shape[0]) < 0.02
        src[m] = (src[m] + rng.integers(1, 4, m.sum())) % 4
        seqs.append(src)
    names = [f"TX{i:04d}" for i in range(len(seqs))]
    fa = d / "txps.fasta"
    with open(fa, "w") as fh:
        for nm, s in zip(names, seqs):
            fh.write(f">{nm}\n{decode_seq(s)}\n")

    # decoy: random genome-like sequence
    decoy_fa = d / "decoy.fasta"
    with open(decoy_fa, "w") as fh:
        fh.write(">decoy1\n" + decode_seq(
            rng.integers(0, 4, 20000).astype(np.uint8)) + "\n")

    # expression: dirichlet-ish, some zero
    expr = rng.gamma(0.3, 1.0, len(seqs))
    expr[rng.random(len(seqs)) < 0.2] = 0.0
    lens = np.array([s.shape[0] for s in seqs], dtype=np.float64)
    w = expr * np.maximum(lens - 250, 1)
    p = w / w.sum()

    truth = np.zeros(len(seqs))
    r1 = d / "r1.fastq"
    r2 = d / "r2.fastq"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        for i in range(N_PAIRS):
            t = int(rng.choice(len(seqs), p=p))
            L = seqs[t].shape[0]
            fl = int(np.clip(rng.normal(250, 25), 2 * READ_LEN,
                             max(2 * READ_LEN, L)))
            fl = min(fl, L)
            s = int(rng.integers(0, L - fl + 1))
            truth[t] += 1
            left = seqs[t][s:s + READ_LEN].copy()
            right = revcomp_codes(seqs[t][s + fl - READ_LEN:s + fl]).copy()
            for r in (left, right):
                m = rng.random(READ_LEN) < ERR
                r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
            f1.write(f"@sim{i}\n{decode_seq(left)}\n+\n"
                     f"{'I' * READ_LEN}\n")
            f2.write(f"@sim{i}\n{decode_seq(right)}\n+\n"
                     f"{'I' * READ_LEN}\n")
    return {"fa": str(fa), "decoy": str(decoy_fa), "r1": str(r1),
            "r2": str(r2), "truth": truth, "names": names}


def test_sim_accuracy_with_errors(sim):
    from scipy.stats import spearmanr

    idx = build_index(sim["fa"], k=31, decoys_path=sim["decoy"])
    assert idx.num_targets == len(sim["names"]) + 1
    assert idx.first_decoy_index == len(sim["names"])

    o = SalmonDefaults()
    r = quantify(idx, "IU", [sim["r1"]], [sim["r2"]], opts=o,
                 progress=False)
    # with 1% per-base errors and DP validation the mapping rate stays
    # high
    assert r.num_mapped / r.num_processed >= 0.95, (
        r.num_mapped, r.num_processed)
    est = dict(zip(r.names, r.counts))
    t = sim["truth"]
    e = np.array([est.get(nm, 0.0) for nm in sim["names"]])
    rho = spearmanr(t, e).statistic
    assert rho >= 0.97, f"sim Spearman {rho}"
    # expressed transcripts: relative error bounded
    hi = t >= 50
    rel = np.abs(e[hi] - t[hi]) / t[hi]
    assert np.median(rel) < 0.15, float(np.median(rel))
