"""Sub-stage profile of the seed stage (77% of the mapping pipeline at
round 3): kmer extraction, hash lookup, occurrence expansion, chain
scoring — each as its own jit, timed with loop amplification.

Usage: python scripts/profile_r3_seed.py [R] [tokens...]
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
DATA = os.path.join(HERE, "tests", "data")


def log(m):
    print(m, flush=True)


def bench_amp(fn, args, reps=3, n_amp=10):
    import jax
    import jax.numpy as jnp
    sync = jax.jit(
        lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))

    def leaf(out):
        ls = jax.tree_util.tree_leaves(out)
        return max(ls, key=lambda a: a.size)
    _ = float(sync(leaf(fn(*args))))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_amp):
            out = fn(*args)
        _ = float(sync(leaf(out)))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - 26.0) / n_amp


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.index.builder import build_index
    from salmon_tpu.mapping import pipeline as pl
    from salmon_tpu.mapping.kmers import extract_kmers
    from salmon_tpu.mapping.lookup import hash_lookup
    from salmon_tpu.mapping.score import (expand_occurrences,
                                          score_candidates)
    from bench import _load_reads

    log(f"# device: {jax.devices()[0].device_kind}")
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    over = {}
    for tok in sys.argv[2:]:
        k, v = tok.split("=")
        over[k] = int(v) if v.lstrip("-").isdigit() else v

    hs = bool(over.pop("hs", 0))
    if hs:
        from salmon_tpu.index.builder import load_index
        cache = os.environ.get(
            "BENCH_CACHE", os.path.join(os.path.expanduser("~"),
                                        ".cache", "salmon_tpu_bench"))
        idx = load_index(os.path.join(cache, "hs_idx"))
        r1 = os.path.join(cache, "reads_1.fastq")
        r2 = os.path.join(cache, "reads_2.fastq")
    else:
        idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
        r1 = os.path.join(DATA, "reads_1.fastq")
        r2 = os.path.join(DATA, "reads_2.fastq")
    dev = pl.device_index_arrays(idx)
    cfg = dataclasses.replace(
        pl.MapperConfig.from_index(idx, validate_mappings=True), **over)
    batch = _load_reads(r1, r2, R)
    codes, lengths = batch["codes_l"], batch["lengths_l"]

    @jax.jit
    def s_kmer(codes, lengths):
        km = extract_kmers(codes, lengths, cfg.k)
        if cfg.kmer_stride > 1:
            km = {k: v[:, ::cfg.kmer_stride] for k, v in km.items()}
        return km

    @jax.jit
    def s_lookup(km, tab_rows):
        return hash_lookup(km["hi"], km["lo"], tab_rows,
                           cfg.n_slots, cfg.max_probes)

    @jax.jit
    def s_expand(km, lk, occ_quad):
        return expand_occurrences(
            km, lk, occ_quad,
            cfg.occ_cap, cfg.max_occs_per_hit, stride=cfg.kmer_stride,
            inline_pool=cfg.inline_singles)

    @jax.jit
    def s_score(exp):
        key, rpos, diag, ovalid = exp[:4]
        n_windows = key.shape[1] // cfg.occ_cap
        window_bits = max(8, int(np.ceil(np.log2(max(n_windows, 2)))))
        return score_candidates(
            key, rpos, diag, cfg.max_cands, stride=cfg.kmer_stride,
            window_bits=window_bits,
            diag_bucket_bits=pl.diag_bucket_bits_for(cfg.max_tpos,
                                                     window_bits))

    km = s_kmer(codes, lengths)
    lk = s_lookup(km, dev["tab_rows"])
    exp = s_expand(km, lk, dev["occ_oct"])
    _ = s_score(exp)
    log(f"# shapes: kmer hi {km['hi'].shape}, occ key {exp[0].shape}")

    t_k = bench_amp(s_kmer, (codes, lengths))
    t_l = bench_amp(s_lookup, (km, dev["tab_rows"]))
    t_e = bench_amp(s_expand, (km, lk, dev["occ_oct"]))
    t_s = bench_amp(s_score, (exp,))
    tot = t_k + t_l + t_e + t_s
    log(f"R={R} over={over} (ONE end; pipeline runs this x2)")
    log(f"kmer   {t_k:7.2f} ms ({t_k/tot*100:4.1f}%)")
    log(f"lookup {t_l:7.2f} ms ({t_l/tot*100:4.1f}%)")
    log(f"expand {t_e:7.2f} ms ({t_e/tot*100:4.1f}%)")
    log(f"score  {t_s:7.2f} ms ({t_s/tot*100:4.1f}%)")
    log(f"sum    {tot:7.2f} ms per end")


if __name__ == "__main__":
    main()
