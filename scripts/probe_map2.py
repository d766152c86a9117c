"""DP-stage internals + filter-stage variants + EM marginal cost."""

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
    from salmon_tpu.index.builder import build_index
    from salmon_tpu.io.fastq import _iter_fastq_seqs, pack_seqs
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays)
    from salmon_tpu.mapping import align as al

    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
    cfg = MapperConfig.from_index(idx)
    dev = device_index_arrays(idx)

    # --- DP kernel at K=65536 problems, L=50, via banded_scores_indexed
    K = 65536
    NR = 16384
    L = 64
    reads = jnp.asarray(rng.integers(0, 4, (4 * NR, L)).astype(np.uint8))
    ids = jnp.asarray(rng.integers(0, 4 * NR, K).astype(np.int32))
    rl = jnp.full((K,), 50, jnp.int32)
    tsel = rng.integers(0, idx.num_targets, K).astype(np.int32)
    toff = jnp.asarray(idx.seq_offsets[tsel].astype(np.int32))
    tlen = jnp.asarray(idx.lengths[tsel].astype(np.int32))
    pos = jnp.asarray(
        np.minimum(rng.integers(0, 2000, K),
                   np.maximum(idx.lengths[tsel] - 60, 1)).astype(np.int32))

    for tile in (512, 2048, 8192):
        al.PALLAS_TILE = tile
        f = jax.jit(lambda r, i, ln, p, tl, off: al.banded_scores_indexed(
            r, i, ln, p, tl, dev["seq_codes"], off, 15, 2.0, -4.0, 6.0,
            2.0, seq_words=dev["seq4"], seq_words_shift=256))
        ms = bench_amp(f, (reads, ids, rl, pos, tlen, toff))
        log(f"banded_scores_indexed K={K} tile={tile}: {ms:.2f} ms")
    al.PALLAS_TILE = 512

    # window fetch alone
    f_w = jax.jit(lambda off: al._fetch_windows_packed(
        dev["seq4"], off, 80))
    a0 = jnp.asarray((idx.seq_offsets[tsel] + 256).astype(np.int32))
    log(f"fetch_windows K={K} W=80: {bench_amp(f_w, (a0,)):.2f} ms")

    # compaction machinery (argsort of 1M prio + takes)
    R, T2 = 16384, 64
    valid = jnp.asarray(rng.random((R, T2)) < 0.05)

    def comp(valid):
        vf = valid.reshape(-1)
        prio = jnp.where(vf, jnp.uint32(0), jnp.uint32(1))
        order = jnp.argsort(prio)
        sel = order[:R * 4]
        return jnp.take(vf, sel), sel
    f_c = jax.jit(comp)
    log(f"dp compaction argsort+take: {bench_amp(f_c, (valid,)):.2f} ms")

    # --- filter-stage variants: gather styles on (R, T2)
    M = 1000
    tbl = jnp.asarray(rng.random(M + 1).astype(np.float32))
    tbl2 = jnp.asarray(rng.random((M + 1, 2)).astype(np.float32))
    fidx = jnp.asarray(rng.integers(0, M, (R, T2)).astype(np.int32))

    f_g1 = jax.jit(lambda t, i: jnp.take(t, i, mode="clip"))
    log(f"fld elem-gather (R,{T2}): {bench_amp(f_g1, (tbl, fidx)):.2f} ms")
    f_g2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))
    log(f"fld row2-gather (R,{T2}): {bench_amp(f_g2, (tbl2, fidx)):.2f} ms")
    fidx32 = fidx[:, :32]
    log(f"fld elem-gather (R,32): {bench_amp(f_g1, (tbl, fidx32)):.2f} ms")

    # compat: gather vs arithmetic
    compat6 = jnp.asarray(rng.random(6) < 0.5)
    obs = jnp.asarray(rng.integers(0, 6, (R, T2)).astype(np.int32))
    f_cg = jax.jit(lambda c, o: jnp.take(c, jnp.clip(o, 0, 5)))
    log(f"compat gather: {bench_amp(f_cg, (compat6, obs)):.2f} ms")

    def arith(c, o):
        out = jnp.zeros(o.shape, bool)
        for i in range(6):
            out = out | ((o == i) & c[i])
        return out
    f_ca = jax.jit(arith)
    log(f"compat arithmetic: {bench_amp(f_ca, (compat6, obs)):.2f} ms")

    # sort cost in filter (txp_key, w) at (R,64) vs (R,32)
    tk = jnp.asarray(rng.integers(0, 2**30, (R, T2)).astype(np.int32))
    w = jnp.asarray(rng.random((R, T2)).astype(np.float32))

    def srt(tk, w):
        return jax.lax.sort((tk, w), dimension=1, num_keys=1,
                            is_stable=False)
    f_s = jax.jit(srt)
    log(f"filter sort (R,64) 2op: {bench_amp(f_s, (tk, w)):.2f} ms")
    log(f"filter sort (R,32) 2op: "
        f"{bench_amp(f_s, (tk[:, :32], w[:, :32])):.2f} ms")

    # --- EM marginal: 50- and 250-iter routed runs, both prewarmed
    from salmon_tpu.inference import em as em_mod
    from salmon_tpu.inference import fastem
    from salmon_tpu.inference.eqclasses import PackedEqClasses
    T = 250_000
    NCLS = 250_000
    sizes = np.minimum(1 + rng.geometric(0.35, NCLS), 50).astype(np.int32)
    E = int(sizes.sum())
    seg = np.repeat(np.arange(NCLS), sizes)
    labels = rng.integers(0, T, E).astype(np.int32)
    weights = rng.random(E)
    wsum = np.bincount(seg, weights=weights, minlength=NCLS)
    weights = weights / wsum[seg]
    counts = rng.integers(1, 50, NCLS).astype(np.float64)
    offsets = np.zeros(NCLS + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    eq = PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                         counts=counts, class_sizes=sizes)
    eff = np.full(T, 300.0)
    a0e = em_mod.initial_alphas(T, None, eq.num_fragments)
    pri = em_mod.prior_alphas(T, eff, 1e-2, True)
    packed = fastem.pack_routed(eq, T, eff)
    for n_it in (50, 250):
        fastem.optimize_routed(eq, T, eff, a0e, pri, True, 1e-12, n_it,
                               n_it, packed=packed)  # compile
    t = {}
    for n_it in (50, 250):
        t0 = time.perf_counter()
        fastem.optimize_routed(eq, T, eff, a0e, pri, True, 1e-12, n_it,
                               n_it, packed=packed)
        t[n_it] = time.perf_counter() - t0
    marg = (t[250] - t[50]) / 200
    log(f"EM routed: 50it {t[50]:.3f}s, 250it {t[250]:.3f}s -> marginal "
        f"{marg * 1e3:.2f} ms/iter ({1 / marg:.0f} iters/s steady)")


if __name__ == "__main__":
    main()
