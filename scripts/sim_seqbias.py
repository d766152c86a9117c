"""Sequence-bias correction evaluation: simulate random-hexamer-primed
fragmentation (the bias --seqBias models, Roberts et al. 2011) and
compare TPM error with and without correction.

Generative model: each fragment start s on transcript i is drawn with
weight exp(sum_j S[base(s+j), j]) over the 6-mer at the start (and the
reverse-complement hexamer at the fragment end, mirrored), where S is a
random position-weight matrix of strength SEQBIAS_SCALE. Reads per
transcript ~ eta_i * total usable weight, so the molar truth is eta.

Usage: [SEQBIAS_SCALE=1.0] [SEQBIAS_TXPS=48] [SEQBIAS_FRAGS=80000]
  python scripts/sim_seqbias.py

MEASURED (2026-08-18, defaults): uncorrected mean |log TPM err| 0.0719,
--seqBias 0.0294 — a 59.1% error reduction.
"""

import os
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SCALE = float(os.environ.get("SEQBIAS_SCALE", 1.0))
FLEN_MU, FLEN_SD = 200, 15
READ_LEN = 75
K = 6


def make_sim(out_dir, n_txps, n_frags, seed=11):
    rng = np.random.default_rng(seed)
    lens = np.linspace(600, 6000, n_txps).astype(int)
    rng.shuffle(lens)
    names = [f"SIM{i:03d}" for i in range(n_txps)]
    codes = [rng.integers(0, 4, L).astype(np.int8) for L in lens]
    # position-weight matrix over the start hexamer (fixed across txps)
    S = rng.normal(0.0, SCALE, (4, K))

    def start_weights(c):
        L = c.shape[0]
        n = max(L - FLEN_MU, 1)
        w = np.zeros(n)
        for j in range(K):
            w += S[c[j:j + n], j]
        return np.exp(w)

    eta = rng.lognormal(0.0, 1.0, n_txps)
    sw = [start_weights(c) for c in codes]
    mass = eta * np.array([w.sum() for w in sw])
    cnt = rng.multinomial(n_frags, mass / mass.sum())
    tpm_true = eta / eta.sum() * 1e6

    os.makedirs(out_dir, exist_ok=True)
    b2c = np.array(list("ACGT"))
    with open(os.path.join(out_dir, "transcripts.fasta"), "w") as fh:
        for nm, c in zip(names, codes):
            fh.write(f">{nm}\n{''.join(b2c[c])}\n")

    comp = str.maketrans("ACGT", "TGCA")
    with open(os.path.join(out_dir, "reads_1.fastq"), "w") as f1, \
            open(os.path.join(out_dir, "reads_2.fastq"), "w") as f2:
        rn = 0
        for i in range(n_txps):
            if not cnt[i]:
                continue
            c = codes[i]
            L = lens[i]
            seq = "".join(b2c[c])
            w = sw[i]
            p = w / w.sum()
            starts = rng.choice(w.shape[0], size=cnt[i], p=p)
            flens = np.clip(rng.normal(FLEN_MU, FLEN_SD, cnt[i])
                            .astype(int), 2 * READ_LEN, None)
            for s, fl in zip(starts, flens):
                fl = int(min(fl, L - s))
                left = seq[s:s + READ_LEN]
                right = seq[s + fl - READ_LEN:s + fl]
                right = right.translate(comp)[::-1]
                nm = f"{rn}:{names[i]}:{s}:{fl}"
                f1.write(f"@{nm}\n{left}\n+\n{'I' * len(left)}\n")
                f2.write(f"@{nm}\n{right}\n+\n{'I' * len(right)}\n")
                rn += 1
    return names, tpm_true


def run_quant(sim_dir, out, flags):
    from salmon_tpu.cli import main
    idx_dir = os.path.join(sim_dir, "idx")
    if not os.path.isdir(idx_dir):
        assert main(["index", "-t",
                     os.path.join(sim_dir, "transcripts.fasta"),
                     "-i", idx_dir, "-k", "31"]) == 0
    assert main(["quant", "-i", idx_dir, "-l", "IU",
                 "-1", os.path.join(sim_dir, "reads_1.fastq"),
                 "-2", os.path.join(sim_dir, "reads_2.fastq"),
                 "-o", out, *flags, "-q"]) == 0
    from salmon_tpu.io.writers import read_quant_sf
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    return dict(zip(q["Name"], q["TPM"]))


def tpm_error(names, tpm_true, est):
    t = np.asarray(tpm_true, float)
    e = np.array([est.get(nm, 0.0) for nm in names])
    m = (t > 0) & (e > 0)
    return float(np.mean(np.abs(np.log(e[m] / t[m]))))


def main():
    sim_dir = tempfile.mkdtemp(prefix="salmon_tpu_seqbias_")
    names, tpm_true = make_sim(
        sim_dir,
        n_txps=int(os.environ.get("SEQBIAS_TXPS", 48)),
        n_frags=int(os.environ.get("SEQBIAS_FRAGS", 80000)))
    print(f"# sim at {sim_dir}", file=sys.stderr, flush=True)
    e0 = tpm_error(names, tpm_true,
                   run_quant(sim_dir, os.path.join(sim_dir, "q0"), []))
    e1 = tpm_error(names, tpm_true,
                   run_quant(sim_dir, os.path.join(sim_dir, "q1"),
                             ["--seqBias"]))
    print(f"mean |log TPM err|: uncorrected {e0:.4f}  --seqBias {e1:.4f} "
          f"(gain {100 * (1 - e1 / max(e0, 1e-12)):.1f}%)")


if __name__ == "__main__":
    main()
