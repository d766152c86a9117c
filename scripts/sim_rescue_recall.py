"""Measure orphan-rescue recall: FLD-quantile probes vs mean-only.

The reference rescues orphans with a full-window edlib search
(src/quant/SalmonQuantify.cpp:1356-1364); we probe banded DP at a few
FLD-quantile-predicted mate positions (mapping/pipeline.py
_rescue_orphans). This harness quantifies the recall gap:

  - generate pairs whose right mate is seed-destroyed but alignable,
    with TRUE fragment lengths drawn from the (learned) FLD,
  - run rescue with rescue_probes = 1 (mean only) and the default 3,
    plus an oracle upper bound (probe at the true fragment length),
  - report recall = rescued / orphan-candidates for narrow and wide
    FLDs.

A wide FLD is the interesting case: one band around the mean misses
fragments in the tails; quantile probes at the same total DP budget
recover them. Usage: python scripts/sim_rescue_recall.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(sigma, probes, n=48, seed=0, oracle=False):
    import jax.numpy as jnp

    from salmon_tpu.index.builder import build_index
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays,
                                             map_paired_batch)
    from salmon_tpu.utils import libformat
    from salmon_tpu.utils.dna import decode_seq, revcomp_codes
    from salmon_tpu.io.fastq import pack_seqs

    data = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "data")
    idx = build_index(os.path.join(data, "transcripts.fasta"), k=31)
    rng = np.random.default_rng(seed)
    R, RL = 1024, 76  # K = R/4 = 256 DP slots: 48x5 probes all fit
    mean_fl = 280.0
    # learned-FLD analog: truncated normal log-pmf over [0, 1000]
    M = 1001
    xs = np.arange(M, dtype=np.float64)
    pmf = np.exp(-0.5 * ((xs - mean_fl) / sigma) ** 2)
    pmf[: 2 * RL] = 0.0  # fragment at least covers both mates
    pmf /= pmf.sum()
    logpmf = np.log(np.maximum(pmf, 1e-300)).astype(np.float32)

    s1, s2, true_fl = [], [], []
    made = 0
    while made < n:
        tid = int(rng.integers(0, idx.num_valid_targets))
        codes = idx.transcript_codes(tid)
        L = codes.shape[0]
        fl = int(np.clip(rng.normal(mean_fl, sigma), 2 * RL, M - 1))
        if L <= fl + 2:
            continue
        start = int(rng.integers(0, L - fl))
        left = codes[start:start + RL].copy()
        right = revcomp_codes(codes[start + fl - RL:start + fl]).copy()
        for p in range(5, RL, 12):  # destroy every k=31 seed window
            right[p] = (right[p] + 1) % 4
        s1.append(decode_seq(left).encode())
        s2.append(decode_seq(right).encode())
        true_fl.append(fl)
        made += 1
    c1, l1 = pack_seqs(s1, R, RL)
    c2, l2 = pack_seqs(s2, R, RL)
    batch = {"codes_l": jnp.asarray(c1), "lengths_l": jnp.asarray(l1),
             "codes_r": jnp.asarray(c2), "lengths_r": jnp.asarray(l2)}
    dev = device_index_arrays(idx)
    if oracle:
        # oracle: a point-mass FLD at each read's true fragment length
        # is not expressible batch-wide; approximate with per-read runs
        # of Q=1 and a point-mass pmf. Recall is then the DP/band
        # ceiling (position exactly right).
        rescued = 0
        fmt = libformat.parse_library_format("IU")
        cp = jnp.asarray(libformat.paired_compat_table(fmt))
        co = jnp.asarray(libformat.orphan_compat_table(fmt))
        cfg = MapperConfig.from_index(idx, recover_orphans=True)
        cfg = cfg.replace(rescue_probes=1) if hasattr(cfg, "replace") \
            else cfg
        for i in range(n):
            pm = np.full(M, 1e-30, np.float32)
            pm[true_fl[i]] = 1.0
            lp = jnp.asarray(np.log(pm / pm.sum()), jnp.float32)
            b1 = {k: v[i:i + 1] for k, v in batch.items()}
            # pad to a small power of two for shape reuse
            b1 = {k: jnp.concatenate([v] * 8, 0) for k, v in b1.items()}
            out = map_paired_batch(b1, dev, cfg, lp, cp, co)
            rescued += int(int(out["num_orphans_rescued"]) > 0)
        return rescued, n
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))
    import dataclasses
    cfg = MapperConfig.from_index(idx, recover_orphans=True)
    cfg = dataclasses.replace(cfg, rescue_probes=probes)
    out = map_paired_batch(batch, dev, cfg, jnp.asarray(logpmf), cp,
                           co)
    return int(out["num_orphans_rescued"]), n


def main():
    print(f"{'FLD sigma':>10} {'probes':>7} {'recall':>8}")
    for sigma in (25.0, 80.0, 160.0):
        for probes in (1, 3, 5):
            r, n = run(sigma, probes)
            print(f"{sigma:>10.0f} {probes:>7d} {r}/{n} = {r / n:.3f}")
        r, n = run(sigma, 1, oracle=True)
        print(f"{sigma:>10.0f} {'oracle':>7} {r}/{n} = {r / n:.3f}")


if __name__ == "__main__":
    main()
