"""Human-scale accuracy run: quantify the synthetic 200k-txp reads with
the real CLI and score NumReads against the read-name ground truth
(names encode readnum:txp:fragstart:fraglen).

Usage: python scripts/eval_hs_accuracy.py [out_dir]
Env: BENCH_CACHE (default ~/.cache/salmon_tpu_bench)
"""

import os
import subprocess
import sys
from collections import Counter

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.environ.get(
    "BENCH_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                "salmon_tpu_bench"))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hs_quant"
    r1 = os.path.join(CACHE, "reads_1.fastq")
    r2 = os.path.join(CACHE, "reads_2.fastq")
    idx = os.path.join(CACHE, "hs_idx")
    prev = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ,
               PYTHONPATH=HERE + (os.pathsep + prev if prev else ""))
    cmd = [sys.executable, "-m", "salmon_tpu.cli", "quant", "-i", idx,
           "-l", "IU", "-1", r1, "-2", r2, "-o", out]
    print("#", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=HERE)

    truth = Counter()
    with open(r1) as fh:
        for i, ln in enumerate(fh):
            if i % 4 == 0:
                truth[ln[1:].split(":")[1]] += 1
    est = {}
    with open(os.path.join(out, "quant.sf")) as fh:
        next(fh)
        for ln in fh:
            f = ln.split("\t")
            est[f[0]] = float(f[4])
    names = sorted(est)
    t = np.array([truth.get(n, 0) for n in names], float)
    e = np.array([est[n] for n in names], float)
    from scipy.stats import spearmanr, pearsonr
    expressed = (t > 0) | (e > 0)
    rho_all = spearmanr(t, e).statistic
    rho_exp = spearmanr(t[expressed], e[expressed]).statistic
    r = pearsonr(np.log1p(t), np.log1p(e)).statistic
    print(f"txps={len(names)} expressed={int(expressed.sum())} "
          f"truth_frags={int(t.sum())} est_frags={e.sum():.0f}")
    print(f"Spearman(all)={rho_all:.5f} Spearman(expressed)={rho_exp:.5f} "
          f"Pearson(log)={r:.5f}")


if __name__ == "__main__":
    main()
