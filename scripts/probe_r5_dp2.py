"""Round-5 DP probe 2: skew-free kernel (in-kernel static band slices)
and 2-bit ref packing for the window fetch.

Variants:
  noskew   : kernel consumes ref_win (L8+B8 rows) directly; row j's band
             is the static slice [j, j+B) of the step's 48-row block
  fetch2   : 2-bit packed fetch (256 bases per 32-byte row)
  combo    : fetch2 + noskew end-to-end vs current full

Usage: python scripts/probe_r5_dp2.py [variants...]
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


NEG = -1e9


def banded_pallas_noskew(reads_t, ref_win_t, lens_row, bandwidth,
                         ma, mp, go, ge, PT=512):
    """Kernel variant: no pre-skew; each grid step loads an aligned
    (B8 + 8)-row block of ref_win and slices row j's band statically."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, P = reads_t.shape
    B = 2 * bandwidth + 1
    B8 = -(-B // 8) * 8
    BLK = B8 + 8
    W = ref_win_t.shape[0]
    n_tiles = -(-P // PT)
    Pp = n_tiles * PT
    L8 = -(-L // 8) * 8
    nL8 = L8 // 8
    reads_t = jnp.pad(reads_t, ((0, L8 - L), (0, Pp - P)),
                      constant_values=4)
    ref_win_t = jnp.pad(ref_win_t, ((0, L8 + BLK - W), (0, Pp - P)),
                        constant_values=5)
    n_shift = int(np.ceil(np.log2(max(B, 2))))
    lens_row = jnp.pad(lens_row, ((0, 0), (0, Pp - P)))

    def kernel(lens_ref, reads_ref, ref_ref, out_ref, H_s, F_s):
        lb = pl.program_id(1)

        @pl.when(lb == 0)
        def _():
            H_s[:, :] = jnp.zeros((B8, PT), jnp.float32)
            F_s[:, :] = jnp.full((B8, PT), NEG, jnp.float32)

        lo = lens_ref[0:1, :]
        hi = lens_ref[1:2, :]
        H = H_s[:, :]
        F = F_s[:, :]
        neg_row = jnp.full((1, PT), NEG, jnp.float32)
        # aligned dynamic sublane load of this step's BLK ref rows;
        # per-row bands below are static unaligned slices of the value
        blk = ref_ref[pl.ds(lb * 8, BLK), :]

        for j in range(8):
            i = lb * 8 + j
            rc = reads_ref[j:j + 1, :].astype(jnp.int32)
            refs = jax.lax.slice_in_dim(blk, j, j + B8,
                                        axis=0).astype(jnp.int32)
            match = (rc == refs) & (rc < 4) & (refs < 4)
            sub = jnp.where(match, ma, mp)
            sub = jnp.where(refs >= 5, -1000.0, sub)
            # band rows beyond B-1 are inert (2-D iota: Mosaic rejects
            # 1-D iota reshapes)
            dpad = jax.lax.broadcasted_iota(jnp.int32, (B8, PT), 0) >= B
            sub = jnp.where(dpad, -1000.0, sub)

            F_n = jnp.maximum(
                jnp.concatenate([F[1:, :], neg_row], axis=0) - ge,
                jnp.concatenate([H[1:, :], neg_row], axis=0) - go - ge)
            H_nf = jnp.maximum(H + sub, F_n)
            X = H_nf - go
            sft = 1
            for _ in range(n_shift):
                pad = jnp.full((min(sft, B8), PT), NEG, jnp.float32)
                if sft < B8:
                    X = jnp.maximum(
                        X, jnp.concatenate([pad, X[:-sft, :]], axis=0)
                        - ge * sft)
                sft *= 2
            E = jnp.concatenate([neg_row, X[:-1, :]], axis=0) - ge
            H_new = jnp.maximum(H_nf, E)
            active = (i >= lo) & (i < hi)
            H = jnp.where(active, H_new, H)
            F = jnp.where(active, F_n, F)

        H_s[:, :] = H
        F_s[:, :] = F

        @pl.when(lb == nL8 - 1)
        def _():
            out_ref[0:1, :] = jnp.max(H, axis=0, keepdims=True)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, nL8),
        in_specs=[
            pl.BlockSpec((2, PT), lambda t, l: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, PT), lambda t, l: (l, t),
                         memory_space=pltpu.VMEM),
            # whole per-tile ref window resident in VMEM (constant in
            # l, so Pallas skips re-copies); ~76 KB at PT=512
            pl.BlockSpec((L8 + BLK, PT), lambda t, l: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PT), lambda t, l: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B8, PT), jnp.float32),
                        pltpu.VMEM((B8, PT), jnp.float32)],
    )(lens_row, reads_t, ref_win_t)
    return out.reshape(-1)[:P]


def pack_seq2w(seq_codes, lead_pad=256):
    """2-bit pack: 16 bases/u32 word, 8-word rows = 128 bases/row."""
    codes = np.asarray(seq_codes, np.uint8)
    padded = np.concatenate([
        np.zeros(lead_pad, np.uint8), codes & 3, np.zeros(256, np.uint8)])
    n = padded.shape[0]
    n128 = -(-n // 128) * 128
    padded = np.pad(padded, (0, n128 - n))
    nib = padded.reshape(-1, 16).astype(np.uint32)
    words = np.zeros(nib.shape[0], dtype=np.uint32)
    for j in range(16):
        words |= nib[:, j] << np.uint32(2 * j)
    return words.reshape(-1, 8), lead_pad


def fetch_windows_packed2(seq_word_rows, a0, W):
    """2-bit variant of _fetch_windows_packed: rows of 8 u32 words = 128
    bases."""
    import jax.numpy as jnp
    n_words = (W + 15) // 16 + 1
    n_rows = (n_words + 7) // 8 + 1
    P = a0.shape[0]
    w0 = a0 >> 4
    r0 = (w0 >> 3).astype(jnp.int32)
    ridx = r0[:, None] + jnp.arange(n_rows, dtype=jnp.int32)[None, :]
    rows = jnp.take(seq_word_rows, ridx, axis=0, mode="clip")
    flat_w = rows.reshape(P, n_rows * 8)
    wsel = (w0 & 7).astype(jnp.int32)
    w_al = flat_w[:, 0:n_words]
    for s in range(1, 8):
        w_al = jnp.where((wsel == s)[:, None],
                         flat_w[:, s:s + n_words], w_al)
    bas = jnp.stack([(w_al >> jnp.uint32(2 * j)) & jnp.uint32(0x3)
                     for j in range(16)], axis=-1).reshape(
        P, n_words * 16).astype(jnp.int8)
    shift = (a0 & 15).astype(jnp.int32)
    out = bas[:, 0:W]
    for s in range(1, 16):
        out = jnp.where((shift == s)[:, None], bas[:, s:s + W], out)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from salmon_tpu.mapping import align

    which = set(sys.argv[1:]) or {"noskew", "fetch2", "combo",
                                  "parity"}
    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    K = 65536
    L = 100
    NR = 4 * 16384
    total_seq = 400_000_000
    n_txps = 200_000

    reads_h = rng.integers(0, 4, (NR, L)).astype(np.uint8)
    reads = jnp.asarray(reads_h)
    ids = jnp.asarray(rng.integers(0, NR, K).astype(np.int32))
    lens = jnp.asarray(np.full(K, L, np.int32))
    tsel = rng.integers(0, n_txps, K).astype(np.int32)
    toff_h = (np.arange(n_txps, dtype=np.int64)
              * (total_seq // n_txps))
    toff = jnp.asarray(toff_h[tsel].astype(np.int64))
    tlen = jnp.asarray(np.full(K, total_seq // n_txps, np.int32))
    pos = jnp.asarray(rng.integers(0, 1500, K).astype(np.int32))

    base_seq = rng.integers(0, 4, 2_000_000).astype(np.uint8)
    seq4_h, shift4 = align.pack_seq4(base_seq)
    reps4 = (total_seq // 64 + 16) // seq4_h.shape[0] + 1
    seq4 = jnp.asarray(np.tile(seq4_h, (reps4, 1)))
    seq2_h, shift2 = pack_seq2w(base_seq)
    reps2 = (total_seq // 128 + 16) // seq2_h.shape[0] + 1
    seq2 = jnp.asarray(np.tile(seq2_h, (reps2, 1)))

    bw = 15
    B = 2 * bw + 1
    W = L + B - 1

    if "fetch2" in which:
        @jax.jit
        def v_fetch2(seq2, pos, toff):
            a0 = toff + (pos - bw + shift2).astype(toff.dtype)
            return fetch_windows_packed2(seq2, jnp.maximum(a0, 0), W)
        t = bench_amp(v_fetch2, (seq2, pos, toff))
        log(f"fetch2(W={W})         : {t:6.2f} ms")

    def full_noskew(seq_rows, fetchfn, sh):
        @jax.jit
        def v(seq_rows, pos, toff, reads, ids):
            a0 = toff + (pos - bw + sh).astype(toff.dtype)
            ref_win = fetchfn(seq_rows, jnp.maximum(a0, 0), W)
            w_idx = pos[:, None] + (jnp.arange(W, dtype=jnp.int32)
                                    - bw)[None, :]
            w_oob = (w_idx < 0) | (w_idx >= tlen[:, None])
            ref_win = jnp.where(w_oob, jnp.int8(5), ref_win)
            reads_p = jnp.take(reads, ids, axis=0, mode="clip")
            lens_row = jnp.stack([jnp.zeros_like(lens), lens], axis=0)
            return banded_pallas_noskew(reads_p.T, ref_win.T, lens_row,
                                        bw, 2.0, -4.0, 6.0, 2.0)
        return v

    if "noskew" in which:
        v = full_noskew(seq4, align._fetch_windows_packed, shift4)
        t = bench_amp(v, (seq4, pos, toff, reads, ids))
        log(f"full noskew (4-bit)   : {t:6.2f} ms")

    if "combo" in which:
        v = full_noskew(seq2, fetch_windows_packed2, shift2)
        t = bench_amp(v, (seq2, pos, toff, reads, ids))
        log(f"full noskew+fetch2    : {t:6.2f} ms")

    if "parity" in which:
        # small-scale parity vs the shipped path (offsets confined to
        # the first tiled copy, where seq2/seq4 encode the same bases)
        Ks = 1024
        toff = jnp.asarray(rng.integers(0, 1_500_000, K)
                           .astype(np.int64))
        v = full_noskew(seq2, fetch_windows_packed2, shift2)
        got = np.asarray(v(seq2, pos, toff, reads, ids))[:Ks]

        @jax.jit
        def ref(seq4, pos, toff, reads, ids):
            return align.banded_scores_indexed(
                reads, ids, lens, pos, tlen, jnp.zeros(1, jnp.uint8),
                toff, bw, 2.0, -4.0, 6.0, 2.0, seq_words=seq4,
                seq_words_shift=shift4,
                read_starts=jnp.zeros(K, jnp.int32))
        want = np.asarray(ref(seq4, pos, toff, reads, ids))[:Ks]
        ok = np.array_equal(got, want)
        log(f"parity noskew+fetch2 vs shipped: "
            f"{'OK' if ok else 'MISMATCH'} "
            f"(max|d|={np.abs(got - want).max()})")


if __name__ == "__main__":
    main()
