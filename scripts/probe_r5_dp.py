"""Round-5 DP probe: decompose banded-DP cost and test kernel variants.

Variants at bench shapes (65536 problems, L=100, bw=15 -> B8=32):
  fetch     : seq4 window fetch alone
  skew      : + pre-skew build
  kern512   : current kernel (PT=512)
  kern1024  : PT=1024 (half the grid steps)
  kern2048  : PT=2048
  kern_i16  : int16 state (2x VPU packing if Mosaic vectorizes it)
  kern_bw3  : bw=3 (B8=8) narrow-band tier cost
  full      : banded_scores_indexed end-to-end

Usage: python scripts/probe_r5_dp.py [variants...]
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def log(m):
    print(m, flush=True)


def bench_amp(fn, args, reps=3, n_amp=10):
    import jax
    import jax.numpy as jnp
    sync = jax.jit(
        lambda o: jnp.sum(o.ravel()[::257].astype(jnp.float32)))
    _ = float(sync(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_amp):
            out = fn(*args)
        _ = float(sync(out))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) * 1e3 - 26.0) / n_amp


def main():
    import jax
    import jax.numpy as jnp
    from salmon_tpu.mapping import align

    which = set(sys.argv[1:]) or {
        "fetch", "skew", "kern512", "kern1024", "kern_i16", "kern_bw3",
        "full"}
    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    K = 65536
    L = 100
    NR = 4 * 16384
    total_seq = 400_000_000
    n_txps = 200_000

    reads = jnp.asarray(rng.integers(0, 4, (NR, L)).astype(np.uint8))
    ids = jnp.asarray(rng.integers(0, NR, K).astype(np.int32))
    lens = jnp.asarray(np.full(K, L, np.int32))
    starts0 = jnp.asarray(np.zeros(K, np.int32))
    tsel = rng.integers(0, n_txps, K).astype(np.int32)
    toff_h = (np.arange(n_txps, dtype=np.int64)
              * (total_seq // n_txps))
    toff = jnp.asarray(toff_h[tsel].astype(np.int64))
    tlen = jnp.asarray(np.full(K, total_seq // n_txps, np.int32))
    pos = jnp.asarray(rng.integers(0, 1500, K).astype(np.int32))
    seq4_h, shift = align.pack_seq4(
        rng.integers(0, 4, total_seq // 64).astype(np.uint8))
    # fake a big word matrix without 400M of host RAM: tile rows
    reps_needed = (total_seq // 64 + 256 // 64 + 8) // seq4_h.shape[0] + 1
    seq4 = jnp.asarray(np.tile(seq4_h, (reps_needed, 1)))
    log(f"# seq4 rows: {seq4.shape}")

    bw = 15
    B = 2 * bw + 1
    W = L + B - 1

    if "fetch" in which:
        @jax.jit
        def v_fetch(seq4, pos, toff):
            a0 = toff + (pos - bw + shift).astype(toff.dtype)
            return align._fetch_windows_packed(seq4, jnp.maximum(a0, 0),
                                               W)
        t = bench_amp(v_fetch, (seq4, pos, toff))
        log(f"fetch(W={W})          : {t:6.2f} ms")

    def make_skew(Wv, bwv):
        Bv = 2 * bwv + 1
        B8 = -(-Bv // 8) * 8
        L8 = -(-L // 8) * 8

        @jax.jit
        def v_skew(seq4, pos, toff, reads, ids):
            a0 = toff + (pos - bwv + shift).astype(toff.dtype)
            ref_win = align._fetch_windows_packed(
                seq4, jnp.maximum(a0, 0), Wv)
            ref_win_t = ref_win.T
            ref_win_t = jnp.pad(
                ref_win_t, ((0, L8 + B8 - Wv), (0, 0)),
                constant_values=5)
            i_idx = jnp.repeat(jnp.arange(L8, dtype=jnp.int32), B8)
            d_idx = jnp.tile(jnp.arange(B8, dtype=jnp.int32), L8)
            skew = jnp.take(ref_win_t, i_idx + d_idx, axis=0,
                            mode="clip")
            return jnp.where((d_idx >= Bv)[:, None], jnp.int8(5), skew)
        return v_skew

    if "skew" in which:
        t = bench_amp(make_skew(W, bw), (seq4, pos, toff, reads, ids))
        log(f"fetch+skew            : {t:6.2f} ms")

    def run_full(tile, bwv):
        Bv = 2 * bwv + 1
        Wv = L + Bv - 1
        old = align.PALLAS_TILE
        align.PALLAS_TILE = tile

        @jax.jit
        def v(seq4, pos, toff, reads, ids):
            return align.banded_scores_indexed(
                reads, ids, lens, pos, tlen, jnp.zeros(1, jnp.uint8),
                toff, bwv, 2.0, -4.0, 6.0, 2.0, seq_words=seq4,
                seq_words_shift=shift, read_starts=starts0)
        try:
            t = bench_amp(v, (seq4, pos, toff, reads, ids))
        finally:
            align.PALLAS_TILE = old
        return t

    for name, tile, bwv in (("kern512", 512, bw), ("kern1024", 1024, bw),
                            ("kern2048", 2048, bw),
                            ("kern_bw3", 512, 3)):
        if name in which:
            t = run_full(tile, bwv)
            log(f"full {name:<9}       : {t:6.2f} ms")

    if "full" in which:
        t = run_full(512, bw)
        log(f"full (current)        : {t:6.2f} ms")


if __name__ == "__main__":
    main()
