"""Round-2 TPU profiling: EM primitive formulations + mapping batch scaling.

Run on the real chip:  python scripts/profile_r2.py 2>&1 | tee /tmp/prof_r2.log
Prints incremental timings (median of reps) so partial output is useful.
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
DATA = os.path.join(HERE, "tests", "data")


def bench(fn, *args, reps=5, warmup=1):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3  # ms


def log(msg):
    print(msg, flush=True)


def part_a_em_primitives():
    import jax
    import jax.numpy as jnp

    T = 250_000          # txps
    NCLS = 250_000       # classes
    rng = np.random.default_rng(0)
    sizes = np.minimum(1 + rng.geometric(0.35, NCLS), 50)
    E = int(sizes.sum())
    log(f"## EM primitives: T={T} NCLS={NCLS} E={E}")
    seg = np.repeat(np.arange(NCLS, dtype=np.int32), sizes)
    labels = rng.integers(0, T, E).astype(np.int32)
    vals = rng.random(E).astype(np.float32)
    alpha = jnp.asarray(rng.random(T).astype(np.float32))
    labels_sorted = np.sort(labels)

    d_seg = jnp.asarray(seg)
    d_lab = jnp.asarray(labels)
    d_lab_s = jnp.asarray(labels_sorted)
    d_val = jnp.asarray(vals)

    # 1. baseline-style ops
    f = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=NCLS))
    log(f"segsum E->NCLS (unsorted-lab order, seg sorted): "
        f"{bench(f, d_val, d_seg):.2f} ms")
    f2 = jax.jit(lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=NCLS, indices_are_sorted=True))
    log(f"segsum E->NCLS sorted-flag: {bench(f2, d_val, d_seg):.2f} ms")
    g = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=T))
    log(f"segsum E->T unsorted: {bench(g, d_val, d_lab):.2f} ms")
    g2 = jax.jit(lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=T, indices_are_sorted=True))
    log(f"segsum E->T sorted ids+flag: {bench(g2, d_val, d_lab_s):.2f} ms")

    # 2. 1-D gather vs 2-D row gather
    h = jax.jit(lambda a, i: jnp.take(a, i, mode="clip"))
    log(f"1-D take alpha[E ids]: {bench(h, alpha, d_lab):.2f} ms")
    W = 8
    nrow = -(-E // W)
    idx2d = np.zeros((nrow, W), np.int32)
    idx2d.reshape(-1)[:E] = labels
    d_idx2d = jnp.asarray(idx2d)
    h2 = jax.jit(lambda a, i: jnp.take(a, i, mode="clip"))
    log(f"take alpha[(E/8,8) ids] elem-gather: "
        f"{bench(h2, alpha, d_idx2d):.2f} ms")
    alpha_rows = jnp.asarray(
        np.repeat(np.asarray(alpha)[:, None], 1, axis=1))  # (T,1)
    h3 = jax.jit(lambda a, i: jnp.take(a, i, axis=0, mode="clip"))
    log(f"row-take (T,1)[(E/8,8)] -> (E/8,8,1): "
        f"{bench(h3, alpha_rows, d_idx2d):.2f} ms")
    # row gather where each row is 8 wide (fetch 8 payload words)
    alpha_r8 = jnp.tile(alpha[:, None], (1, 8))
    h4 = jax.jit(lambda a, i: jnp.take(a, i, axis=0, mode="clip"))
    idx_rows = jnp.asarray(idx2d[:, :1])  # (E/8,1) row ids
    log(f"row-take (T,8)[(E/8,1)] -> (E/8,1,8): "
        f"{bench(h4, alpha_r8, idx_rows):.2f} ms")

    # 3. scatter-add formulations
    s1 = jax.jit(lambda v, i: jnp.zeros(T, jnp.float32).at[i].add(v))
    log(f"scatter-add 1-D [E]: {bench(s1, d_val, d_lab):.2f} ms")
    vals2d = np.zeros((nrow, W), np.float32)
    vals2d.reshape(-1)[:E] = vals
    d_val2d = jnp.asarray(vals2d)
    s2 = jax.jit(lambda v, i: jnp.zeros(T, jnp.float32).at[i].add(v))
    log(f"scatter-add 2-D idx [(E/8,8)]: "
        f"{bench(s2, d_val2d, d_idx2d):.2f} ms")
    s3 = jax.jit(lambda v, i: jnp.zeros(T, jnp.float32).at[i].add(
        v, indices_are_sorted=True, unique_indices=False))
    log(f"scatter-add 1-D sorted-flag: {bench(s3, d_val, d_lab_s):.2f} ms")

    # 4. cumsum / elementwise layout sensitivity
    x1 = jnp.asarray(vals)
    c1 = jax.jit(lambda x: jnp.cumsum(x))
    log(f"cumsum 1-D [E]: {bench(c1, x1):.2f} ms")
    x2 = jnp.asarray(vals2d)  # (E/8, 8)
    c2 = jax.jit(lambda x: jnp.cumsum(x, axis=0))
    log(f"cumsum 2-D axis0 (E/8,8): {bench(c2, x2):.2f} ms")
    nr128 = -(-E // 128)
    v128 = np.zeros((nr128, 128), np.float32)
    v128.reshape(-1)[:E] = vals
    x3 = jnp.asarray(v128)
    c3 = jax.jit(lambda x: jnp.cumsum(x, axis=1))
    log(f"cumsum 2-D axis1 (E/128,128): {bench(c3, x3):.2f} ms")
    c4 = jax.jit(lambda x: jnp.cumsum(x, axis=0))
    log(f"cumsum 2-D axis0 (E/128,128): {bench(c4, x3):.2f} ms")
    e1 = jax.jit(lambda x: x * 2.0 + 1.0)
    log(f"elementwise 1-D [E]: {bench(e1, x1):.3f} ms")
    e2 = jax.jit(lambda x: x * 2.0 + 1.0)
    log(f"elementwise 2-D (E/128,128): {bench(e2, x3):.3f} ms")

    # 5. one-hot select: (N,W) rows gathered then col select
    N2 = nrow
    cols = rng.integers(0, W, (N2, 16)).astype(np.int32)
    rows_i = rng.integers(0, N2, (N2, 16)).astype(np.int32)
    d_cols = jnp.asarray(cols)
    d_rows = jnp.asarray(rows_i)
    surf = jnp.asarray(vals2d)

    def onehot_sel(sf, r, c):
        rowvals = jnp.take(sf, r, axis=0, mode="clip")      # (N2,16,W)
        oh = jax.nn.one_hot(c, W, dtype=sf.dtype)           # (N2,16,W)
        return jnp.sum(rowvals * oh, axis=-1)               # (N2,16)
    o1 = jax.jit(onehot_sel)
    log(f"row-gather+onehot-select (N2={N2},16,W=8): "
        f"{bench(o1, surf, d_rows, d_cols):.2f} ms")

    # 6. full dense-bucketed EM-update candidate (W=8 surface)
    #    gather alpha rows -> gamma surface -> per-class denom -> contrib
    #    -> transposed gather back to alpha
    # class rows: one row per class here (sizes<=8 clipped for the test)
    sizes8 = np.minimum(sizes, 8)
    lab_surface = np.zeros((NCLS, 8), np.int32)
    w_surface = np.zeros((NCLS, 8), np.float32)
    pos = 0
    for_col = np.arange(8)
    # vectorized fill
    m = for_col[None, :] < sizes8[:, None]
    cnt = int(m.sum())
    lab_surface[m] = labels[:cnt] if cnt <= E else 0
    w_surface[m] = vals[:cnt] if cnt <= E else 0
    d_labsurf = jnp.asarray(lab_surface)
    d_wsurf = jnp.asarray(w_surface)
    d_counts = jnp.asarray(rng.random(NCLS).astype(np.float32))

    def em_dense_fwd(a, labs, w, counts):
        g = jnp.take(a, labs, mode="clip") * w          # elem gather (NCLS,8)
        denom = g.sum(axis=1, keepdims=True)
        contrib = counts[:, None] * g / jnp.maximum(denom, 1e-30)
        return contrib
    f_fwd = jax.jit(em_dense_fwd)
    log(f"EM fwd elem-gather (NCLS,8): "
        f"{bench(f_fwd, alpha, d_labsurf, d_wsurf, d_counts):.2f} ms")

    def em_dense_fwd_rows(a2, labs, w, counts):
        g = jnp.take(a2, labs, axis=0, mode="clip")[..., 0] * w
        denom = g.sum(axis=1, keepdims=True)
        contrib = counts[:, None] * g / jnp.maximum(denom, 1e-30)
        return contrib
    f_fwd2 = jax.jit(em_dense_fwd_rows)
    log(f"EM fwd row-gather (T,1): "
        f"{bench(f_fwd2, alpha_rows, d_labsurf, d_wsurf, d_counts):.2f} ms")

    # scatter side: contrib (NCLS,8) -> alpha via .at[labs].add
    def em_scatter(contrib, labs):
        return jnp.zeros(T, jnp.float32).at[labs].add(contrib)
    f_sc = jax.jit(em_scatter)
    contrib0 = f_fwd(alpha, d_labsurf, d_wsurf, d_counts)
    log(f"EM scatter (NCLS,8)->T: {bench(f_sc, contrib0, d_labsurf):.2f} ms")

    # transposed gather: per-txp entry list (row, col) padded to Wt=16
    Wt = 16
    order = np.argsort(lab_surface.reshape(-1), kind="stable")
    slab = lab_surface.reshape(-1)[order]
    srow = (order // 8).astype(np.int32)
    scol = (order % 8).astype(np.int32)
    # count per txp, cap Wt
    t_rows = np.zeros((T, Wt), np.int32)
    t_cols = np.zeros((T, Wt), np.int32)
    t_msk = np.zeros((T, Wt), bool)
    starts = np.searchsorted(slab, np.arange(T))
    ends = np.searchsorted(slab, np.arange(T) + 1)
    nn = np.minimum(ends - starts, Wt)
    colj = np.arange(Wt)[None, :]
    sel_m = colj < nn[:, None]
    flat_src = starts[:, None] + colj
    flat_src = np.minimum(flat_src, len(slab) - 1)
    t_rows = np.where(sel_m, srow[flat_src], 0).astype(np.int32)
    t_cols = np.where(sel_m, scol[flat_src], 0).astype(np.int32)
    t_msk = sel_m
    d_trows = jnp.asarray(t_rows)
    d_tcols = jnp.asarray(t_cols)
    d_tmsk = jnp.asarray(t_msk)

    def em_transposed(contrib, tr, tc, tm):
        rowvals = jnp.take(contrib, tr, axis=0, mode="clip")   # (T,Wt,8)
        oh = jax.nn.one_hot(tc, 8, dtype=contrib.dtype)
        v = jnp.sum(rowvals * oh, axis=-1)
        return jnp.sum(jnp.where(tm, v, 0.0), axis=1)
    f_tr = jax.jit(em_transposed)
    log(f"EM transposed-gather (T,{Wt},8): "
        f"{bench(f_tr, contrib0, d_trows, d_tcols, d_tmsk):.2f} ms")

    # 7. existing run_em baseline at this scale
    from salmon_tpu.inference.eqclasses import PackedEqClasses
    from salmon_tpu.inference import em as em_mod
    offsets = np.zeros(NCLS + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    eq = PackedEqClasses(
        labels=labels, weights=vals.astype(np.float64),
        offsets=offsets,
        class_sizes=sizes.astype(np.int32),
        counts=np.ones(NCLS, np.float64) * 3)
    eff = np.full(T, 300.0, np.float32)
    t0 = time.perf_counter()
    res = em_mod.optimize(eq, T, eff)
    dt = time.perf_counter() - t0
    log(f"run_em baseline: {res['iterations']} iters in {dt:.1f}s "
        f"(incl compile) -> timing loop...")
    eqd, _ = em_mod.pad_eqclasses(eq)
    import jax.numpy as jnp2
    a0 = jnp.asarray(np.random.default_rng(1).random(T).astype(np.float32))
    pri = jnp.asarray(np.full(T, 1e-2, np.float32))
    f_em = lambda a: em_mod.run_em(
        eqd, a, pri, T, True, 1e-8, 20, 20, 0,
        eff_lens=jnp.asarray(eff))
    ms = bench(f_em, a0, reps=3)
    log(f"run_em 20 fixed iters: {ms:.1f} ms -> {20 / (ms / 1e3):.1f} iters/s")


def part_b_mapping():
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

    log("## mapping batch scaling (sample index)")
    for R in (4096, 8192, 16384, 32768):
        c1, l1 = pack_seqs(reads1, len(reads1), read_len)
        c2, l2 = pack_seqs(reads2, len(reads2), read_len)
        n = len(reads1)
        reps = -(-R // n)
        batch = {
            "codes_l": jnp.asarray(np.tile(c1, (reps, 1))[:R]),
            "lengths_l": jnp.asarray(np.tile(l1, reps)[:R]),
            "codes_r": jnp.asarray(np.tile(c2, (reps, 1))[:R]),
            "lengths_r": jnp.asarray(np.tile(l2, reps)[:R]),
        }
        f = lambda b: map_paired_batch(b, dev, cfg, fld_logpmf, cp, co)
        ms = bench(f, batch, reps=5)
        log(f"R={R}: {ms:.1f} ms -> {R / (ms / 1e3):,.0f} frags/s")

    # stage timings at R=16384
    R = 16384
    c1, l1 = pack_seqs(reads1, len(reads1), read_len)
    c2, l2 = pack_seqs(reads2, len(reads2), read_len)
    n = len(reads1)
    reps = -(-R // n)
    codes_l = jnp.asarray(np.tile(c1, (reps, 1))[:R])
    lengths_l = jnp.asarray(np.tile(l1, reps)[:R])

    from salmon_tpu.mapping.kmers import extract_kmers
    from salmon_tpu.mapping.lookup import hash_lookup
    from salmon_tpu.mapping.score import (expand_occurrences,
                                          score_candidates)

    log(f"## stage timings R={R} (one end)")
    f_km = jax.jit(lambda c, L: extract_kmers(c, L, cfg.k))
    ms = bench(f_km, codes_l, lengths_l)
    log(f"extract_kmers: {ms:.2f} ms")
    km = {k: v[:, ::cfg.kmer_stride]
          for k, v in f_km(codes_l, lengths_l).items()}
    km = {k: jax.device_put(v) for k, v in km.items()}

    f_lk = jax.jit(lambda hi, lo: hash_lookup(
        hi, lo, dev["tab_rows"], cfg.n_slots, cfg.max_probes))
    ms = bench(f_lk, km["hi"], km["lo"])
    log(f"hash_lookup: {ms:.2f} ms")
    lk = f_lk(km["hi"], km["lo"])
    start_c, count_c, found = lk[:3]

    f_ex = jax.jit(lambda km_, lk_: expand_occurrences(
        km_, lk_, dev["occ_oct"], cfg.occ_cap,
        cfg.max_occs_per_hit, stride=cfg.kmer_stride,
        inline_pool=cfg.inline_singles))
    ms = bench(f_ex, km, start_c, count_c, found)
    log(f"expand_occurrences: {ms:.2f} ms")
    key, rpos, diag, ovalid = f_ex(km, lk)[:4]
    Rr = codes_l.shape[0]
    nn = key.shape[1] * key.shape[2]

    f_sc = jax.jit(lambda k, r, d: score_candidates(
        k.reshape(Rr, nn), r.reshape(Rr, nn), d.reshape(Rr, nn),
        cfg.max_cands, stride=cfg.kmer_stride))
    ms = bench(f_sc, key, rpos, diag)
    log(f"score_candidates (N={nn}): {ms:.2f} ms")


if __name__ == "__main__":
    import jax
    log(f"# device: {jax.devices()[0].device_kind}, "
        f"platform {jax.default_backend()}")
    if len(sys.argv) > 1 and sys.argv[1] == "map":
        part_b_mapping()
    elif len(sys.argv) > 1 and sys.argv[1] == "em":
        part_a_em_primitives()
    else:
        part_a_em_primitives()
        part_b_mapping()
