"""Full mapping-pipeline stage attribution at human scale.

Times each pipeline stage (and key sub-costs of the DP stage) with
amplified dispatch + forced readback. Device arrays ride as jit args.

Usage: python scripts/profile_pipe2.py [human|sample] [R] [occ_cap] [stride]
"""

import os
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.97")
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
DATA = os.path.join(HERE, "tests", "data")
CACHE = os.environ.get(
    "BENCH_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                "salmon_tpu_bench"))
N_AMP = int(os.environ.get("N_AMP", 4))


def bench_amp(fn, args, reps=3, n_amp=N_AMP):
    import jax
    import jax.numpy as jnp
    sync = jax.jit(lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))

    def leaf(out):
        return jax.tree_util.tree_leaves(out)[0]
    _ = float(sync(leaf(fn(*args))))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_amp):
            out = fn(*args)
        _ = float(sync(leaf(out)))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - 26.0) / n_amp


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.index.builder import build_index, load_index
    from salmon_tpu.io.fastq import _iter_fastq_seqs, pack_seqs
    from salmon_tpu import mapping
    from salmon_tpu.mapping import pipeline as pl
    from salmon_tpu.mapping.pair import (MS_LEFT_ORPHAN, MS_RIGHT_ORPHAN,
                                         join_pairs,
                                         merge_paired_with_orphans,
                                         orphan_hits)
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat

    which = sys.argv[1] if len(sys.argv) > 1 else "human"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    occ_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    stride = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    log(f"# device: {jax.devices()[0].device_kind}  which={which} R={R}")
    if which == "human":
        idx = load_index(os.path.join(CACHE, "hs_idx"))
        r1 = os.path.join(CACHE, "reads_1.fastq")
        r2 = os.path.join(CACHE, "reads_2.fastq")
    else:
        idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
        r1 = os.path.join(DATA, "reads_1.fastq")
        r2 = os.path.join(DATA, "reads_2.fastq")
    over = {"sparse_seed": False}
    if occ_cap:
        over["occ_cap"] = occ_cap
    if stride:
        over["kmer_stride"] = stride
    cfg = pl.MapperConfig.from_index(idx, **over)
    dev = pl.device_index_arrays(idx)
    log(f"# cfg: occ_cap={cfg.occ_cap} stride={cfg.kmer_stride} "
        f"max_cands={cfg.max_cands} T2={cfg.max_pair_cands} "
        f"W={cfg.weight_width} dp_budget={cfg.dp_budget}")

    reads1 = list(_iter_fastq_seqs(r1))
    reads2 = list(_iter_fastq_seqs(r2))
    L = max(len(s) for s in reads1 + reads2)
    c1, l1 = pack_seqs(reads1, len(reads1), L)
    c2, l2 = pack_seqs(reads2, len(reads2), L)
    reps_n = -(-R // len(reads1))
    batch = {
        "codes_l": jnp.asarray(np.tile(c1, (reps_n, 1))[:R]),
        "lengths_l": jnp.asarray(np.tile(l1, reps_n)[:R]),
        "codes_r": jnp.asarray(np.tile(c2, (reps_n, 1))[:R]),
        "lengths_r": jnp.asarray(np.tile(l2, reps_n)[:R]),
    }
    fldo = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fldl = jnp.asarray(fldo.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    # ---- full pipeline
    f_full = jax.jit(lambda b, d: pl.map_paired_batch_impl(
        b, d, cfg, fldl, cp, co))
    out = f_full(batch, dev)
    mf = float(out["num_mapped"]) / float(out["num_processed"])
    t_full = bench_amp(f_full, (batch, dev))
    log(f"FULL pipeline: {t_full:.2f} ms -> {R/(t_full/1e3):,.0f} "
        f"frags/s (mapped {mf:.4f})")

    # ---- seed stage
    f_seed = jax.jit(lambda b, d: pl._seed_candidates(
        [b["codes_l"], b["codes_r"]],
        [b["lengths_l"], b["lengths_r"]], d, cfg))
    log(f"seed (both ends): {bench_amp(f_seed, (batch, dev)):.2f} ms")

    # ---- through join
    def thru_join(b, d):
        (cl, sl), (cr, sr) = pl._seed_candidates(
            [b["codes_l"], b["codes_r"]],
            [b["lengths_l"], b["lengths_r"]], d, cfg)
        paired = join_pairs(cl, cr, sl, sr, b["lengths_l"],
                            b["lengths_r"], cfg.max_pair_cands,
                            cfg.fld_max, cfg.allow_dovetail)
        ol = orphan_hits(cl, sl, MS_LEFT_ORPHAN, cfg.max_pair_cands)
        orh = orphan_hits(cr, sr, MS_RIGHT_ORPHAN, cfg.max_pair_cands)
        return merge_paired_with_orphans(paired, ol, orh,
                                         cfg.discard_orphans)
    f_join = jax.jit(thru_join)
    t_join = bench_amp(f_join, (batch, dev))
    log(f"thru join: {t_join:.2f} ms")

    # ---- through DP
    def thru_dp(b, d):
        joined = thru_join(b, d)
        return pl._dp_scores(joined, b, d, cfg, single_end=False)
    t_dp = bench_amp(jax.jit(thru_dp), (batch, dev))
    log(f"thru dp: {t_dp:.2f} ms (dp stage ~{t_dp - t_join:.2f})")

    # ---- revcomp alone
    f_rc = jax.jit(lambda b: (
        pl._device_revcomp(b["codes_l"], b["lengths_l"]),
        pl._device_revcomp(b["codes_r"], b["lengths_r"])))
    log(f"revcomp both ends: {bench_amp(f_rc, (batch,)):.2f} ms")

    # ---- DP kernel standalone at the in-pipeline problem count
    from salmon_tpu.mapping import align as al
    rng = np.random.default_rng(0)
    budget = (max(2, cfg.dp_budget // 2) if cfg.alignment_cache
              else cfg.dp_budget)
    K = R * budget
    reads_all = jnp.concatenate(
        [batch["codes_l"], batch["codes_l"], batch["codes_r"],
         batch["codes_r"]], axis=0)
    ids = jnp.asarray(rng.integers(0, 4 * R, K).astype(np.int32))
    rl = jnp.full((K,), 100, jnp.int32)
    tsel = rng.integers(0, idx.num_targets, K).astype(np.int32)
    toff_np = idx.seq_offsets[tsel]
    toff = jnp.asarray(toff_np.astype(dev["seq_off"].dtype))
    tlen = jnp.asarray(idx.lengths[tsel].astype(np.int32))
    pos = jnp.asarray(np.minimum(
        rng.integers(0, 2000, K),
        np.maximum(idx.lengths[tsel] - 110, 1)).astype(np.int32))
    f_kern = jax.jit(lambda ra, sw: al.banded_scores_indexed(
        ra, ids, rl, pos, tlen, dev["seq_codes"], toff,
        cfg.dp_bandwidth, 2.0, -4.0, 6.0, 2.0, seq_words=sw,
        seq_words_shift=pl._SEQ4_SHIFT))
    log(f"dp kernel K={K} (one mate): "
        f"{bench_amp(f_kern, (reads_all, dev['seq4'])):.2f} ms")

    # ---- filter stage = full - thru_dp (report arithmetic)
    log(f"filter+weight+emit (residual): {t_full - t_dp:.2f} ms")


if __name__ == "__main__":
    main()
