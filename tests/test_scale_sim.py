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


def test_chaining_prefers_colinear_hits():
    """Co-linear chaining (MemChainer role): a candidate supported by 5
    hits on ONE diagonal must outrank a candidate with 8 hits scattered
    across distant diagonals (bag-of-k-mers inflation)."""
    import jax.numpy as jnp
    from salmon_tpu.mapping.score import score_candidates

    # one read, 16 hit slots: candidate key 10 (txp 5 fw) = 5 co-linear
    # hits at diag 100; candidate key 20 (txp 10 fw) = 8 hits scattered
    # 200 apart
    key = np.full((1, 16), 0xFFFFFFFF, np.uint32)
    rpos = np.zeros((1, 16), np.int32)
    diag = np.zeros((1, 16), np.int32)
    for j in range(5):
        key[0, j] = 10
        rpos[0, j] = 3 * j
        diag[0, j] = 100 + (j % 2)      # tiny indel wobble
    for j in range(8):
        key[0, 5 + j] = 20
        rpos[0, 5 + j] = 3 * j
        diag[0, 5 + j] = 100 + 200 * j  # scattered diagonals
    out = score_candidates(jnp.asarray(key), jnp.asarray(rpos),
                           jnp.asarray(diag), max_cands=4, stride=3)
    txp = np.asarray(out["txp"][0])
    score = np.asarray(out["score"][0])
    best = {int(t): int(s) for t, s in zip(txp, score) if s > 0}
    assert best[5] == 5           # full co-linear chain
    assert best.get(10, 0) <= 1   # scattered hits never chain
    # min_diag of the winner is the true chain diagonal, not an outlier
    md = {int(t): int(d) for t, d, s in zip(txp, np.asarray(
        out["min_diag"][0]), score) if s > 0}
    assert md[5] in (100, 101)
