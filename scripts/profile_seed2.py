"""Seed-stage sub-profiling at human scale: dense vs sparse internals.

Times cumulative prefixes of each flow so differences attribute cost to
individual sub-stages. bench_amp amortizes the dispatch floor by
enqueueing N sequential dispatches before one readback. Device arrays
are passed as jit ARGUMENTS (closure capture would embed the 8.6GB
table as a compiled constant and stall lowering).

Usage: python scripts/profile_seed2.py [human|sample] [R]
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
    from salmon_tpu.mapping.kmers import extract_kmers
    from salmon_tpu.mapping.lookup import hash_lookup, mix32
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays)
    from salmon_tpu.mapping.score import expand_occurrences, score_candidates
    from salmon_tpu.mapping import seed_sparse as ss

    which = sys.argv[1] if len(sys.argv) > 1 else "human"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    log(f"# device: {jax.devices()[0].device_kind}  which={which} R={R}")
    if which == "human":
        idx = load_index(os.path.join(CACHE, "hs_idx"))
        r1 = os.path.join(CACHE, "reads_1.fastq")
        r2 = os.path.join(CACHE, "reads_2.fastq")
    else:
        idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
        r1 = os.path.join(DATA, "reads_1.fastq")
        r2 = os.path.join(DATA, "reads_2.fastq")
    dev = device_index_arrays(idx)
    cfg = MapperConfig.from_index(idx)
    table_planes = dev["tab_rows"]
    occ_quad = dev["occ_oct"]

    reads1 = list(_iter_fastq_seqs(r1))
    reads2 = list(_iter_fastq_seqs(r2))
    L = max(len(s) for s in reads1 + reads2)
    c1, l1 = pack_seqs(reads1, len(reads1), L)
    c2, l2 = pack_seqs(reads2, len(reads2), L)
    reps_n = -(-R // len(reads1))
    codes_l = jnp.asarray(np.tile(c1, (reps_n, 1))[:R])
    lengths_l = jnp.asarray(np.tile(l1, reps_n)[:R])
    codes_r = jnp.asarray(np.tile(c2, (reps_n, 1))[:R])
    lengths_r = jnp.asarray(np.tile(l2, reps_n)[:R])

    k, stride = cfg.k, cfg.kmer_stride

    # ---------------- per-end primitive stages ----------------
    f_km = jax.jit(lambda c, ln: {
        kk: v[:, ::stride] for kk, v in extract_kmers(c, ln, k).items()})
    km_l = f_km(codes_l, lengths_l)
    log(f"extract_kmers/end: {bench_amp(f_km, (codes_l, lengths_l)):.2f} ms"
        f"  P={km_l['hi'].shape[1]}")

    f_lk = jax.jit(lambda km, tr: hash_lookup(
        km["hi"], km["lo"], tr, cfg.n_slots, cfg.max_probes))
    lk_l = f_lk(km_l, table_planes)
    log(f"hash_lookup/end (P={cfg.max_probes} probes): "
        f"{bench_amp(f_lk, (km_l, table_planes)):.2f} ms")

    # hypothetical 2-row-gather lookup floor (CHD-style): one row gather
    # into a displacement table + one row gather into the slot table
    disp = jnp.zeros((1 << 20, 4), jnp.int32)

    def lk2(km, tr, dp):
        mixed = mix32(km["hi"], km["lo"])
        d = jnp.take(dp, (mixed >> jnp.uint32(12)).astype(jnp.int32)
                     & jnp.int32((1 << 20) - 1), axis=0)
        slot = ((mixed ^ jax.lax.bitcast_convert_type(
            d[..., 0], jnp.uint32)) & jnp.uint32(cfg.n_slots - 1))
        rows = jnp.take(tr[0], (slot >> jnp.uint32(1)).astype(jnp.int32),
                        axis=0, mode="clip")
        return rows.sum(axis=-1)
    log(f"lookup floor (2 row gathers): "
        f"{bench_amp(jax.jit(lk2), (km_l, table_planes, disp)):.2f} ms")

    # ---------------- dense flow ----------------
    def f_expand(km, lk, orows):
        return expand_occurrences(km, lk, orows,
                                  cfg.occ_cap, cfg.max_occs_per_hit,
                                  stride=stride,
                                  inline_pool=cfg.inline_singles)
    f_expand_j = jax.jit(f_expand)
    ex = f_expand_j(km_l, lk_l, occ_quad)
    log(f"expand/end (C={cfg.occ_cap}): "
        f"{bench_amp(f_expand_j, (km_l, lk_l, occ_quad)):.2f} ms  "
        f"shape={ex[0].shape}")

    def mk_score(C):
        def f(km, lk, orows):
            key, rpos, diag, _ = expand_occurrences(
                km, lk, orows, C,
                cfg.max_occs_per_hit, stride=stride,
                inline_pool=cfg.inline_singles)[:4]
            Rr = key.shape[0]
            n = key.shape[1]
            nw = key.shape[1] // C
            wb = max(8, int(np.ceil(np.log2(max(nw, 2)))))
            return score_candidates(
                key.reshape(Rr, n), rpos.reshape(Rr, n),
                diag.reshape(Rr, n), cfg.max_cands, stride=stride,
                window_bits=wb)
        return jax.jit(f)
    t_es = bench_amp(mk_score(cfg.occ_cap), (km_l, lk_l, occ_quad))
    log(f"expand+score/end: {t_es:.2f} ms")
    for C in (8, 4):
        log(f"expand+score/end C={C}: "
            f"{bench_amp(mk_score(C), (km_l, lk_l, occ_quad)):.2f} ms")

    # ---------------- sparse flow: cumulative prefixes ----------------
    km_r = f_km(codes_r, lengths_r)
    lk_r = f_lk(km_r, table_planes)

    def sparse_prefix(depth):
        def fn(km_l, lk_l, km_r, lk_r, orows):
            ends = [(km_l, lk_l), (km_r, lk_r)]
            E = len(ends)
            Rr, P = ends[0][1][0].shape
            NE = E * Rr
            B = min(cfg.seed_hits_per_end, P * cfg.occ_cap)
            H = NE * B

            def flat(get):
                parts = [get(km, lk) for km, lk in ends]
                return jnp.stack(parts, axis=1).reshape(-1)

            start = flat(lambda km, lk: lk[0])
            count = flat(lambda km, lk: lk[1])
            found = flat(lambda km, lk: lk[2])
            qfw = flat(lambda km, lk: km["is_fw"])
            kval = flat(lambda km, lk: km["valid"])
            usable = found & kval & (count <= cfg.max_occs_per_hit)
            n = jnp.where(usable, jnp.minimum(count, cfg.occ_cap), 0)
            n2 = n.reshape(NE, P)
            cum_in = jnp.cumsum(n2, axis=1)
            n_used = jnp.clip(B - (cum_in - n2), 0, n2).reshape(-1)
            if depth == 0:
                return n_used
            dest = (jnp.cumsum(n_used) - n_used).astype(jnp.int32)
            W = NE * P
            w_idx = jnp.arange(W, dtype=jnp.int32)
            hdr = jnp.stack(
                [start, (w_idx << jnp.int32(1)) | qfw.astype(jnp.int32),
                 n_used, dest], axis=1)
            keep = n_used > 0
            dest_w = jnp.where(keep, dest, H)
            slots = jnp.zeros((H + 1, 4), jnp.int32).at[dest_w].set(
                hdr, mode="drop")[:H]
            flags = jnp.zeros(H + 1, bool).at[dest_w].set(
                keep, mode="drop")[:H]
            hdrf = ss.segment_carry_first(
                slots, jnp.broadcast_to(flags[:, None], (H, 4)), axis=0)
            if depth == 1:
                return hdrf
            c = jnp.arange(H, dtype=jnp.int32) - hdrf[:, 3]
            hit_ok = c < hdrf[:, 2]
            occ = jnp.take(orows, jnp.clip(hdrf[:, 0] + c, 0, None),
                           axis=0, mode="clip")
            txp = occ[:, 0]
            tpos = occ[:, 1] >> 1
            tfwd = (occ[:, 1] & 1).astype(bool)
            wcol = hdrf[:, 1]
            q_is_fw = (wcol & 1).astype(bool)
            w = wcol >> 1
            rid = w // P
            p = w - rid * P
            rpos = p * stride
            orient_fw = q_is_fw == tfwd
            key = (txp.astype(jnp.uint32) << jnp.uint32(1)) | \
                orient_fw.astype(jnp.uint32)
            key = jnp.where(hit_ok, key, ss.INVALID_KEY)
            diag = jnp.where(orient_fw, tpos - rpos, tpos + rpos)
            rid_u = jnp.where(hit_ok, rid.astype(jnp.uint32),
                              ss.INVALID_KEY)
            wb = max(8, ss._ceil_log2(P))
            db = ((diag + ss.DIAG_OFFSET).astype(jnp.uint32)
                  >> jnp.uint32(5))
            key2 = (db << jnp.uint32(wb)) | p.astype(jnp.uint32)
            key2 = jnp.where(hit_ok, key2, ss.INVALID_KEY)
            if depth == 2:
                return key2
            rid_s, key_s, key2_s, diag_s = jax.lax.sort(
                (rid_u, key, key2, diag), dimension=0, num_keys=3,
                is_stable=False)
            if depth == 3:
                return key_s
            bucket_s = key2_s >> jnp.uint32(wb)
            valid = rid_s != ss.INVALID_KEY

            def prev(a, fill):
                return jnp.concatenate(
                    [jnp.full((1,), fill, a.dtype), a[:-1]])

            def nxt(a, fill):
                return jnp.concatenate(
                    [a[1:], jnp.full((1,), fill, a.dtype)])

            p_rid = prev(rid_s, ss.INVALID_KEY)
            p_key = prev(key_s, ss.INVALID_KEY)
            p_key2 = prev(key2_s, ss.INVALID_KEY)
            p_bucket = p_key2 >> jnp.uint32(wb)
            run_start = valid & ((rid_s != p_rid) | (key_s != p_key)
                                 | (bucket_s != p_bucket))
            run_end = valid & ((rid_s != nxt(rid_s, ss.INVALID_KEY))
                               | (key_s != nxt(key_s, ss.INVALID_KEY))
                               | (bucket_s != nxt(bucket_s,
                                                  ss.INVALID_KEY)))
            uniq = valid & (run_start | (key2_s != p_key2))
            cum = jnp.cumsum(uniq.astype(jnp.int32))
            score = cum - ss.segment_carry_first(
                cum, run_start, axis=0) + 1
            min_diag = ss._segmented_min(diag_s, run_start, axis=0)
            if depth == 4:
                return score + min_diag
            sbits = ss._ceil_log2(P + 2)
            smax = (1 << sbits) - 1
            rank_key = ((rid_s << jnp.uint32(sbits))
                        | jnp.uint32(smax)
                        - jnp.clip(score, 0, smax).astype(jnp.uint32))
            rank_key = jnp.where(run_end, rank_key, ss.INVALID_KEY)
            rk_s, keyc, diagc = jax.lax.sort(
                (rank_key, key_s, min_diag), dimension=0, num_keys=3,
                is_stable=False)
            if depth == 5:
                return rk_s
            ridc = rk_s >> jnp.uint32(sbits)
            seg = ridc != prev(ridc, ss.INVALID_KEY)
            pos_idx = jnp.arange(H, dtype=jnp.int32)
            rank = pos_idx - ss.segment_carry_first(pos_idx, seg, axis=0)
            T = cfg.max_cands
            cand_valid = rk_s != ss.INVALID_KEY
            keepc = cand_valid & (rank < T)
            dest2 = jnp.where(keepc, ridc.astype(jnp.int32) * T + rank,
                              NE * T)
            scorec = jnp.int32(smax) - (rk_s & jnp.uint32(smax)).astype(
                jnp.int32)
            rows = jnp.stack(
                [jax.lax.bitcast_convert_type(keyc, jnp.int32), scorec,
                 diagc], axis=1)
            out = jnp.zeros((NE * T + 1, 3), jnp.int32).at[dest2].set(
                rows, mode="drop")[:NE * T]
            return out
        return jax.jit(fn)

    names = ["budget-cumsum", "+hdr scatter+carry", "+occ gather+keys",
             "+global sort1", "+run scoring scans", "+rank sort2",
             "+emit scatter"]
    prev_t = 0.0
    for d in range(7):
        f = sparse_prefix(d)
        t = bench_amp(f, (km_l, lk_l, km_r, lk_r, occ_quad))
        log(f"sparse depth {d} ({names[d]}): cum {t:.2f} ms "
            f"(delta {t - prev_t:+.2f})")
        prev_t = t

    f_full = jax.jit(lambda a, b, c, d2, orows: ss.seed_candidates_sparse(
        [(a, b), (c, d2)], orows, occ_cap=cfg.occ_cap,
        max_occs_per_hit=cfg.max_occs_per_hit,
        hits_per_end=cfg.seed_hits_per_end,
        max_cands=cfg.max_cands, stride=stride))
    log(f"sparse full: "
        f"{bench_amp(f_full, (km_l, lk_l, km_r, lk_r, occ_quad)):.2f}"
        " ms (both ends)")


if __name__ == "__main__":
    main()
