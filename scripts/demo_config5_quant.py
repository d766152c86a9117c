"""BASELINE config 5 demonstration: sharded genome-decoy quantification
on ONE chip.

Loads the 41.5 GB genome-scale v5 index (3.27G keys / 3.57G occurrence
records, human-scale txome + 3 Gb decoys) as N k-mer shards via the
streamed loader (index.shard.iter_shard_arrays + native table
placement), then quantifies a real read set SHARD-SERIALLY: the one
chip plays each mesh position of the ("reads", "kmer") sharded design
in turn —

  pass 1 (per shard): put that shard's table + occurrence planes in
    HBM, collect every batch's budgeted hit list against it
    (mapping.seed_sparse.collect_hits_sparse with the owner mask —
    exactly the per-device program of parallel.sharded);
  pass 2: per batch, concatenate the shards' hit lists (global
    coordinates), re-apply the budget (rebudget_hits), rank, and run
    the full join/DP/filter/weight pipeline (map_paired_from_cands)
    against the 2-bit packed genome sequence plane.

On a real N-chip mesh the same programs run concurrently with an
all-gather in place of the host concat (parallel/sharded.py, validated
by the driver's dryrun_multichip); this script demonstrates the
capability — genome-scale index load + quant — within one chip's HBM,
and reports the BASELINE-shape numbers.

The two-pass schedule uses the pre-burnin uniform FLD for scoring
(online FLD updates need sequential batch completion; the multi-chip
path keeps them). Output: mapped fraction, per-shard HBM, load/map
wall-clock, and a quant.sf via the routed VBEM.

Usage: python scripts/demo_config5_quant.py [n_shards] [max_frags]
Env: BENCH_CACHE (genome_idx + reads location).
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
CACHE = os.environ.get(
    "BENCH_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                "salmon_tpu_bench"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def read_batches(r1, r2, R, max_frags):
    """Yield padded (codes_l, lens_l, codes_r, lens_r) batches."""
    from salmon_tpu.io.fastq import iter_paired_chunks
    n = 0
    for chunk in iter_paired_chunks([r1], [r2], R, 256):
        yield chunk
        n += int((chunk.left.lengths > 0).sum())
        if n >= max_frags:
            return


def main():
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_frags = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    idx_dir = os.environ.get("CONFIG5_IDX",
                             os.path.join(CACHE, "genome_idx"))
    r1 = os.environ.get("CONFIG5_R1",
                        os.path.join(CACHE, "reads_1.fastq"))
    r2 = os.environ.get("CONFIG5_R2",
                        os.path.join(CACHE, "reads_2.fastq"))
    for p in (idx_dir, r1, r2):
        if not os.path.exists(p):
            log(f"missing {p}; run scripts/build_genome_scale_index.py "
                "(KEEP_GENOME_IDX=1) and make_synthetic_txome.py first")
            return 1

    import jax
    import jax.numpy as jnp
    import functools
    from salmon_tpu.index.shard import iter_shard_arrays
    from salmon_tpu.index import diskfmt
    from salmon_tpu.mapping.pipeline import (MapperConfig, _SEQ4_SHIFT,
                                             map_paired_from_cands)
    from salmon_tpu.mapping.kmers import extract_kmers
    from salmon_tpu.mapping.lookup import hash_lookup, mix32b
    from salmon_tpu.mapping.score import (candidate_read_start,
                                          diag_bucket_bits_for)
    from salmon_tpu.mapping.seed_sparse import (collect_hits_sparse,
                                                rank_hits, rebudget_hits)
    from salmon_tpu.mapping.align import pack_seq4
    from salmon_tpu.utils import libformat
    from salmon_tpu.constants import SalmonDefaults

    log(f"# device: {jax.devices()[0].device_kind}; shards={n_shards}")
    opts = SalmonDefaults()
    R = 16384

    # ---- phase A: streamed sharded load --------------------------------
    t0 = time.time()
    shards = []
    meta = None
    for s, meta, sh in iter_shard_arrays(idx_dir, n_shards):
        n_oct = -(-sh["occ_txp"].shape[0] // 8)
        occ = np.zeros((n_oct * 8, 2), np.int32)
        occ[:sh["occ_txp"].shape[0], 0] = sh["occ_txp"]
        occ[:sh["occ_pf"].shape[0], 1] = sh["occ_pf"]
        shards.append({"tab_rows": sh["tab_rows"],
                       "occ_oct": occ.reshape(n_oct, 16),
                       "n_slots": sh["n_slots"],
                       "shard_bits": sh["shard_bits"]})
        log(f"#   shard {s}: {sh['n_keys'] / 1e6:.0f}M keys, "
            f"{sh['occ_txp'].shape[0] / 1e6:.0f}M occs, "
            f"table {sh['tab_rows'].nbytes / 2**30:.1f} GiB, "
            f"evicted {sh['n_evicted']} "
            f"({time.time() - t0:.0f}s)")
    load_s = time.time() - t0
    shard_bits = shards[0]["shard_bits"]
    n_slots = shards[0]["n_slots"]
    hbm_per_shard = (shards[0]["tab_rows"].nbytes
                     + max(sh["occ_oct"].nbytes for sh in shards))
    log(f"# load: {load_s / 60:.1f} min; per-shard HBM "
        f"{hbm_per_shard / 2**30:.2f} GiB")

    # small planes
    lengths = np.load(os.path.join(idx_dir, "lengths.npy"))
    seq_off = np.load(os.path.join(idx_dir, "seq_offsets.npy"))
    num_txps = int(lengths.shape[0])
    cfg = MapperConfig(
        k=int(meta["k"]), n_slots=n_slots, max_probes=8,
        first_decoy_index=int(meta["first_decoy_index"]),
        num_txps=num_txps, max_tpos=int(lengths.max()),
        occ_cap=min(opts.occ_cap, int(meta.get("max_occs_kept") or 8)),
        sparse_seed=True)

    # ---- phase B1: per-shard hit collection ---------------------------
    P = (opts.max_read_len - cfg.k) // cfg.kmer_stride + 1
    wb = max(8, int(np.ceil(np.log2(max(P, 2)))))
    dbb = diag_bucket_bits_for(cfg.max_tpos, wb)

    @functools.partial(jax.jit, static_argnums=(5,))
    def shard_hits(codes_l, lens_l, codes_r, lens_r, planes, sid):
        tab_rows, occ_oct = planes
        seeded = []
        for codes, lens in ((codes_l, lens_l), (codes_r, lens_r)):
            km = extract_kmers(codes, lens, cfg.k)
            if cfg.kmer_stride > 1:
                km = {k: v[:, ::cfg.kmer_stride] for k, v in km.items()}
            lk = hash_lookup(km["hi"], km["lo"], tab_rows, cfg.n_slots,
                             cfg.max_probes)
            owner = (mix32b(km["hi"], km["lo"])
                     >> jnp.uint32(32 - shard_bits)).astype(jnp.int32)
            found = lk[2] & (owner == sid)
            seeded.append((km, (lk[0], lk[1], found) + lk[3:]))
        return collect_hits_sparse(
            seeded, occ_oct, occ_cap=cfg.occ_cap,
            max_occs_per_hit=cfg.max_occs_per_hit,
            hits_per_end=cfg.seed_hits_per_end, stride=cfg.kmer_stride,
            diag_bucket_bits=dbb)

    batches = list(read_batches(r1, r2, R, max_frags))
    n_frags = sum(int((b.left.lengths > 0).sum()) for b in batches)
    log(f"# {len(batches)} batches, {n_frags} fragments")

    t0 = time.time()
    hits_host = [[None] * n_shards for _ in batches]
    for s, sh in enumerate(shards):
        planes = (jnp.asarray(sh["tab_rows"]), jnp.asarray(sh["occ_oct"]))
        for bi, b in enumerate(batches):
            h = shard_hits(jnp.asarray(b.left.codes),
                           jnp.asarray(b.left.lengths),
                           jnp.asarray(b.right.codes),
                           jnp.asarray(b.right.lengths), planes, s)
            hits_host[bi][s] = tuple(np.asarray(x) for x in h)
        del planes
        log(f"#   shard {s} hits pass done ({time.time() - t0:.0f}s)")
    t_pass1 = time.time() - t0

    # ---- phase B2: merge + rank + full pipeline -----------------------
    seq_codes = diskfmt.unpack_seq2(
        {"seq2": np.load(os.path.join(idx_dir, "seq2.npy"),
                         mmap_mode="r"),
         "seq2_n": np.load(os.path.join(idx_dir, "seq2_n.npy")),
         "seq2_len": np.load(os.path.join(idx_dir, "seq2_len.npy"))})
    words, _ = pack_seq4(seq_codes, lead_pad=_SEQ4_SHIFT)
    del seq_codes
    dev2 = {
        "txp_lens": jnp.asarray(lengths.astype(np.int32)),
        "seq_off": jnp.asarray(seq_off.astype(np.int64)),
        "seq_codes": jnp.zeros(1, jnp.uint8),
        "seq4": jnp.asarray(words),
    }
    del words
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))
    from salmon_tpu.models.fld import FragmentLengthDistribution
    fld = FragmentLengthDistribution(opts.max_frag_length)
    fld_logpmf = {"logpmf": jnp.asarray(fld.log_pmf(), jnp.float32),
                  "logcmf": jnp.asarray(fld.log_cmf(), jnp.float32),
                  "mode": jnp.int32(0)}

    @jax.jit
    def map_batch(codes_l, lens_l, codes_r, lens_r, hits):
        merged = tuple(
            jnp.concatenate([h[i] for h in hits]) for i in range(4))
        merged = rebudget_hits(merged, P=P,
                               hits_per_end=cfg.seed_hits_per_end)
        cands_r = rank_hits(merged, R=R, E=2, P=P,
                            max_cands=cfg.max_cands)
        batch = {"codes_l": codes_l, "lengths_l": lens_l,
                 "codes_r": codes_r, "lengths_r": lens_r}
        cands = [(c, candidate_read_start(c, ln, cfg.k))
                 for c, ln in zip(cands_r, (lens_l, lens_r))]
        return map_paired_from_cands(cands, batch, dev2, cfg,
                                     fld_logpmf, cp, co)

    from salmon_tpu.inference.eqclasses import \
        EquivalenceClassAccumulator
    acc = EquivalenceClassAccumulator()
    t0 = time.time()
    n_mapped = 0
    for bi, b in enumerate(batches):
        hits = tuple(tuple(jnp.asarray(x) for x in h)
                     for h in hits_host[bi])
        out = map_batch(jnp.asarray(b.left.codes),
                        jnp.asarray(b.left.lengths),
                        jnp.asarray(b.right.codes),
                        jnp.asarray(b.right.lengths), hits)
        acc.add_batch(np.asarray(out["eq_txp"]),
                      np.asarray(out["eq_weight"]),
                      np.asarray(out["eq_bins"])
                      if cfg.range_bins > 0 else None)
        n_mapped += int(out["num_mapped"])
    t_pass2 = time.time() - t0
    map_s = t_pass1 + t_pass2
    rate = n_frags / map_s

    # ---- EM + report ---------------------------------------------------
    eq = acc.finish()
    from salmon_tpu.inference import em as em_mod
    from salmon_tpu.inference import fastem
    eff = np.maximum(lengths.astype(np.float64) - 200.0, 10.0)
    a0 = em_mod.initial_alphas(num_txps, None, eq.num_fragments)
    pri = em_mod.prior_alphas(num_txps, eff, 1e-2, True)
    t0 = time.time()
    res = fastem.optimize_routed(eq, num_txps, eff, a0, pri, True,
                                 1e-8, 50, 1000)
    em_s = time.time() - t0
    out = {
        "config": "5 (genome-decoy sharded)",
        "n_shards": n_shards,
        "index_keys_g": round(meta["num_kmers"] / 1e9, 3),
        "index_occs_g": round(meta["num_occurrences"] / 1e9, 3),
        "load_min": round(load_s / 60, 2),
        "per_shard_hbm_gib": round(hbm_per_shard / 2**30, 2),
        "n_frags": n_frags,
        "mapped_frac": round(n_mapped / max(n_frags, 1), 4),
        "map_s": round(map_s, 1),
        "frags_per_s": round(rate, 1),
        "em_s": round(em_s, 1),
        "em_iters": res["iterations"],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
