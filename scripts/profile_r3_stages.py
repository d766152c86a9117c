"""Stage-level profile of the current default mapping flow (round 3).

Times each pipeline stage as its own jit with loop amplification +
forced scalar readback (block_until_ready does not block on this
backend — see NEXT.md measurement gospel). Stages:

  seed    _seed_candidates (lookup + chain score + expand)
  join    join_pairs + orphan_hits + merge
  dp      _dp_scores (banded affine validation)
  weight  _filter_and_weight + eq emission epilogue

Usage: python scripts/profile_r3_stages.py [R] [config tokens...]
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
    import functools

    import jax
    import jax.numpy as jnp

    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.index.builder import build_index
    from salmon_tpu.mapping import pipeline as pl
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat
    from bench import _load_reads

    log(f"# device: {jax.devices()[0].device_kind}")
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    over = {}
    for tok in sys.argv[2:]:
        k, v = tok.split("=")
        over[k] = int(v) if v.lstrip("-").isdigit() else v

    hs = bool(over.pop("hs", 0))
    if hs:
        # human-scale fixture: the bench cache's 200k-txp k=31 index
        # + 100bp read pairs (built once by bench.py)
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
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    flp = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))
    batch = _load_reads(r1, r2, R)

    @jax.jit
    def s_seed(batch, dev):
        return pl._seed_candidates(
            [batch["codes_l"], batch["codes_r"]],
            [batch["lengths_l"], batch["lengths_r"]], dev, cfg)

    @jax.jit
    def s_join(cands, batch):
        (cand_l, start_l), (cand_r, start_r) = cands
        paired = pl.join_pairs(cand_l, cand_r, start_l, start_r,
                               batch["lengths_l"], batch["lengths_r"],
                               cfg.max_pair_cands, cfg.fld_max,
                               cfg.allow_dovetail)
        orph_l = pl.orphan_hits(cand_l, start_l, pl.MS_LEFT_ORPHAN,
                                cfg.max_pair_cands)
        orph_r = pl.orphan_hits(cand_r, start_r, pl.MS_RIGHT_ORPHAN,
                                cfg.max_pair_cands)
        return pl.merge_paired_with_orphans(paired, orph_l, orph_r,
                                            cfg.discard_orphans), paired

    @jax.jit
    def s_dp(joined, batch, dev):
        return pl._dp_scores(joined, batch, dev, cfg, single_end=False)

    @jax.jit
    def s_tail(joined, paired, aln, batch, tlens):
        aln_score, perfect = aln
        real_row = batch["lengths_l"] > 0
        W = min(cfg.weight_width, joined["txp"].shape[1])
        joined_w = {k: (v[:, :W] if v.ndim == 2 else v)
                    for k, v in joined.items()}
        tlen = jnp.take(tlens,
                        jnp.clip(joined_w["txp"], 0, cfg.num_txps - 1),
                        mode="clip")
        left_orph = joined["mate_status"] == pl.MS_LEFT_ORPHAN
        rlen_mapped = jnp.where(left_orph, batch["lengths_l"],
                                batch["lengths_r"])
        return pl._filter_and_weight(
            joined_w, flp, cp, co,
            batch["lengths_l"] + batch["lengths_r"], cfg,
            aln_score=aln_score[:, :W], perfect_score=perfect[:, :W],
            tlen=tlen, rlen_mapped=rlen_mapped)

    cands = s_seed(batch, dev)
    joined, paired = s_join(cands, batch)
    aln = s_dp(joined, batch, dev)
    _ = s_tail(joined, paired, aln, batch, dev["txp_lens"])

    t_seed = bench_amp(s_seed, (batch, dev))
    t_join = bench_amp(s_join, (cands, batch))
    t_dp = bench_amp(s_dp, (joined, batch, dev))
    t_tail = bench_amp(s_tail, (joined, paired, aln, batch,
                                dev["txp_lens"]))
    total = t_seed + t_join + t_dp + t_tail
    log(f"R={R} over={over}")
    log(f"seed   {t_seed:7.2f} ms  ({t_seed/total*100:4.1f}%)")
    log(f"join   {t_join:7.2f} ms  ({t_join/total*100:4.1f}%)")
    log(f"dp     {t_dp:7.2f} ms  ({t_dp/total*100:4.1f}%)")
    log(f"weight {t_tail:7.2f} ms  ({t_tail/total*100:4.1f}%)")
    log(f"sum    {total:7.2f} ms -> {R/total*1e3:,.0f} frags/s "
        f"(stage-sum bound)")


if __name__ == "__main__":
    main()
