"""Loop-amplified mapping-pipeline stage costs on the real chip."""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
DATA = os.path.join(HERE, "tests", "data")
N_AMP = 10


def bench_amp(fn, args, reps=3, n_amp=N_AMP):
    import jax
    import jax.numpy as jnp
    sync = jax.jit(lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))

    def get_leaf(out):
        leaves = jax.tree_util.tree_leaves(out)
        return leaves[0]
    _ = float(sync(get_leaf(fn(*args))))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_amp):
            out = fn(*args)
        _ = float(sync(get_leaf(out)))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - 26.0) / n_amp


def log(m):
    print(m, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.index.builder import build_index
    from salmon_tpu.io.fastq import _iter_fastq_seqs, pack_seqs
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays,
                                             map_paired_batch)
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat

    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    # 0) row-gather vs take_along_axis, loop-amplified
    N = 200_000
    tbl4 = jnp.asarray(rng.integers(0, 100, (N, 4)).astype(np.int32))
    idx3 = jnp.asarray(rng.integers(0, N, (4096, 9, 16)).astype(np.int32))

    def g0(tbl, idx):
        def body(_, acc):
            rows = jnp.take(tbl, idx, axis=0)  # (4096,9,16,4)
            return acc + rows.sum(axis=(1, 2, 3))[:, None] % 7
        return jax.lax.fori_loop(0, N_AMP, body,
                                 jnp.zeros((4096, 1), jnp.int32))
    log(f"rowgather (N,4)[(4096,9,16)] {4096 * 9 * 16 * 4 / 1e6:.1f}M el: "
        f"{bench_amp(jax.jit(g0), (tbl4, idx3)):.3f} ms")

    idx_big = jnp.asarray(rng.integers(0, N, (4096, 9, 16, 4)).astype(
        np.int32))
    tbl1 = jnp.asarray(rng.integers(0, 100, (N,)).astype(np.int32))

    def g1(tbl, idx):
        def body(_, acc):
            v = jnp.take(tbl, idx)  # elementwise gather same volume
            return acc + v.sum(axis=(1, 2, 3))[:, None] % 7
        return jax.lax.fori_loop(0, N_AMP, body,
                                 jnp.zeros((4096, 1), jnp.int32))
    log(f"elemgather (N,)[(4096,9,16,4)] same vol: "
        f"{bench_amp(jax.jit(g1), (tbl1, idx_big)):.3f} ms")

    idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
    cfg = MapperConfig.from_index(idx)
    dev = device_index_arrays(idx)
    reads1 = list(_iter_fastq_seqs(os.path.join(DATA, "reads_1.fastq")))
    reads2 = list(_iter_fastq_seqs(os.path.join(DATA, "reads_2.fastq")))
    read_len = max(len(s) for s in reads1 + reads2)
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    def mk_batch(R):
        c1, l1 = pack_seqs(reads1, len(reads1), read_len)
        c2, l2 = pack_seqs(reads2, len(reads2), read_len)
        n = len(reads1)
        reps = -(-R // n)
        return {
            "codes_l": jnp.asarray(np.tile(c1, (reps, 1))[:R]),
            "lengths_l": jnp.asarray(np.tile(l1, reps)[:R]),
            "codes_r": jnp.asarray(np.tile(c2, (reps, 1))[:R]),
            "lengths_r": jnp.asarray(np.tile(l2, reps)[:R]),
        }

    # full batch at several R (throughput style)
    for R in (4096, 16384, 32768):
        batch = mk_batch(R)
        f = lambda b: map_paired_batch(b, dev, cfg, fld_logpmf, cp, co)
        ms = bench_amp(f, (batch,), n_amp=5)
        log(f"full batch R={R}: {ms:.1f} ms -> {R / ms * 1e3:,.0f} frags/s")

    # per-stage, loop-amplified, R=16384
    R = 16384
    batch = mk_batch(R)
    from salmon_tpu.mapping.kmers import extract_kmers
    from salmon_tpu.mapping.lookup import hash_lookup
    from salmon_tpu.mapping.score import (expand_occurrences,
                                          score_candidates)
    from salmon_tpu.mapping.pair import (join_pairs, orphan_hits,
                                         merge_paired_with_orphans,
                                         MS_LEFT_ORPHAN, MS_RIGHT_ORPHAN)
    from salmon_tpu.mapping import pipeline as pl

    codes_l, lengths_l = batch["codes_l"], batch["lengths_l"]

    f_km = jax.jit(lambda c, L: extract_kmers(c, L, cfg.k))
    log(f"extract_kmers: {bench_amp(f_km, (codes_l, lengths_l)):.2f} ms")
    km_full = f_km(codes_l, lengths_l)
    km = {k: jax.device_put(v[:, ::cfg.kmer_stride])
          for k, v in km_full.items()}

    f_lk = jax.jit(lambda hi, lo: hash_lookup(
        hi, lo, dev["tab_rows"], cfg.n_slots, cfg.max_probes))
    log(f"hash_lookup (P={km['hi'].shape[1]}, probes={cfg.max_probes}): "
        f"{bench_amp(f_lk, (km['hi'], km['lo'])):.2f} ms")
    lk = f_lk(km["hi"], km["lo"])
    start_c, count_c, found = lk[:3]

    f_ex = jax.jit(lambda km_, lk_: expand_occurrences(
        km_, lk_, dev["occ_oct"], cfg.occ_cap,
        cfg.max_occs_per_hit, stride=cfg.kmer_stride,
        inline_pool=cfg.inline_singles))
    log(f"expand_occ (C={cfg.occ_cap}): "
        f"{bench_amp(f_ex, (km, start_c, count_c, found)):.2f} ms")
    key, rpos, diag, ovalid = f_ex(km, lk)[:4]
    nn = key.shape[1] * key.shape[2]

    f_sc = jax.jit(lambda k_, r_, d_: score_candidates(
        k_.reshape(R, nn), r_.reshape(R, nn), d_.reshape(R, nn),
        cfg.max_cands, stride=cfg.kmer_stride))
    log(f"score_candidates (N={nn}): "
        f"{bench_amp(f_sc, (key, rpos, diag)):.2f} ms")
    cand = f_sc(key, rpos, diag)

    from salmon_tpu.mapping.score import candidate_read_start
    start = candidate_read_start(cand, lengths_l, cfg.k)

    f_jp = jax.jit(lambda cl, cr, sl, sr: join_pairs(
        cl, cr, sl, sr, batch["lengths_l"], batch["lengths_r"],
        cfg.max_pair_cands, cfg.fld_max, cfg.allow_dovetail))
    log(f"join_pairs: "
        f"{bench_amp(f_jp, (cand, cand, start, start)):.2f} ms")
    paired = f_jp(cand, cand, start, start)

    orph = orphan_hits(cand, start, MS_LEFT_ORPHAN, cfg.max_pair_cands)
    orph2 = orphan_hits(cand, start, MS_RIGHT_ORPHAN, cfg.max_pair_cands)
    joined = merge_paired_with_orphans(paired, orph, orph2, False)
    joined = jax.tree_util.tree_map(jax.device_put, joined)

    f_dp = jax.jit(lambda j, b: pl._dp_scores(j, b, dev, cfg, False))
    log(f"dp_scores (budget={cfg.dp_budget}/frag): "
        f"{bench_amp(f_dp, (joined, batch)):.2f} ms")
    aln, perf = f_dp(joined, batch)

    tlen = jnp.take(dev["txp_lens"],
                    jnp.clip(joined["txp"], 0, cfg.num_txps - 1),
                    mode="clip")
    rlm = batch["lengths_l"]
    f_fw = jax.jit(lambda j, a, p, t: pl._filter_and_weight(
        j, fld_logpmf, cp, co, None, cfg, aln_score=a, perfect_score=p,
        tlen=t, rlen_mapped=rlm))
    log(f"filter_and_weight: "
        f"{bench_amp(f_fw, (joined, aln, perf, tlen)):.2f} ms")


if __name__ == "__main__":
    main()
