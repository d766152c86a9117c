"""Probe: decompose expand_occurrences cost at human-scale shapes.

Variants (R=16384, P=24, C=8, hs-sized random occ table):
  row0      : the oct row gather alone
  realign   : row0 + 8-way offset realign + ovalid epilogue
  notail    : full expand minus the tail pool
  full      : expand_occurrences as shipped
  inline75  : row0 gather compacted to the 25% non-inline windows
              (sort-select + gather + scatter back), modeling the
              inline-singles table

Usage: python scripts/probe_expand_split.py
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
    import jax
    import jax.numpy as jnp
    from salmon_tpu.mapping.score import expand_occurrences

    log(f"# device: {jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)
    R, P, C = 16384, 24, 8
    F = R * P
    n_oct = 350_000_000 // 8
    occ = jnp.asarray(rng.integers(0, 2**31, (n_oct, 16),
                                   dtype=np.int64).astype(np.int32))
    # aligned starts: phase 0 for multi-occ keys
    start = jnp.asarray((rng.integers(0, n_oct - 2, (R, P),
                                      dtype=np.int64) * 8)
                        .astype(np.int32))
    count = jnp.asarray(np.minimum(
        1 + rng.geometric(0.6, (R, P)), 20).astype(np.int32))
    found = jnp.asarray(rng.random((R, P)) < 0.95)
    km = {
        "hi": jnp.asarray(rng.integers(0, 2**32, (R, P), dtype=np.int64)
                          .astype(np.uint32)),
        "lo": jnp.asarray(rng.integers(0, 2**32, (R, P), dtype=np.int64)
                          .astype(np.uint32)),
        "valid": jnp.asarray(np.ones((R, P), bool)),
        "is_fw": jnp.asarray(rng.random((R, P)) < 0.5),
    }

    @jax.jit
    def v_row0(occ, start):
        q0 = (start >> 3).reshape(F)
        return jnp.take(occ, jnp.clip(q0, 0, None), axis=0, mode="clip")

    @jax.jit
    def v_realign(occ, start, count, found):
        q0 = (start >> 3).reshape(F)
        off = (start.reshape(F) & 7).astype(jnp.int32)
        cnt_c = jnp.minimum(count.reshape(F), C)
        row0 = jnp.take(occ, jnp.clip(q0, 0, None), axis=0, mode="clip")
        txp_all = row0[:, 0::2]
        pf_all = row0[:, 1::2]
        txp_f = txp_all[:, 0:C]
        pf_f = pf_all[:, 0:C]
        for o in range(1, 8):
            m = (off == o)[:, None]
            txp_f = jnp.where(m, txp_all[:, o:o + C
                                         if o + C <= 8 else 8], txp_f) \
                if o + C <= 8 else txp_f
            pf_f = jnp.where(m, pf_all[:, o:o + C if o + C <= 8 else 8],
                             pf_f) if o + C <= 8 else pf_f
        c_idx = jnp.arange(C, dtype=jnp.int32)
        ovalid = (found.reshape(F)[:, None]
                  & (c_idx[None, :] < cnt_c[:, None]))
        return txp_f, pf_f, ovalid

    @jax.jit
    def v_full(km, start, count, found, occ):
        return expand_occurrences(km, start, count, found, occ, C,
                                  1000, stride=3, tail_frac=64)

    @jax.jit
    def v_inline75(occ, start, count, found):
        # 75% of windows inline -> compact the rest into K0 = F//4
        q0 = (start >> 3).reshape(F)
        need = found.reshape(F) & (jnp.arange(F, dtype=jnp.int32)
                                   % 4 == 0)   # model: 25% non-inline
        K0 = F // 4
        idx_bits = max(1, (F - 1).bit_length())
        packed = ((jnp.where(need, jnp.uint32(0), jnp.uint32(1))
                   << jnp.uint32(idx_bits))
                  | jnp.arange(F, dtype=jnp.uint32))
        sel = (jax.lax.sort(packed, dimension=0, is_stable=False)[:K0]
               & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
        rows_k = jnp.take(occ, jnp.clip(jnp.take(q0, sel), 0, None),
                          axis=0, mode="clip")           # (K0, 16)
        buf = jnp.zeros((F, 16), jnp.int32).at[sel].set(
            rows_k, mode="drop")
        return buf

    t0 = bench_amp(v_row0, (occ, start))
    t1 = bench_amp(v_realign, (occ, start, count, found))
    tf = bench_amp(v_full, (km, start, count, found, occ))
    ti = bench_amp(v_inline75, (occ, start, count, found))
    log(f"row0 gather only : {t0:6.2f} ms")
    log(f"row0 + realign   : {t1:6.2f} ms")
    log(f"full expand      : {tf:6.2f} ms")
    log(f"inline75 compacted row fetch (sort+take+scatter): {ti:6.2f} ms")


if __name__ == "__main__" and not (os.environ.get("PROBE_MASK0")
                                   or os.environ.get("PROBE_CUMUL")):
    main()


def probe_mask0():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    R, P = 16384, 24
    F = R * P
    n_oct = 350_000_000 // 8
    occ = jnp.asarray(rng.integers(0, 2**31, (n_oct, 16),
                                   dtype=np.int64).astype(np.int32))
    q0 = jnp.asarray(rng.integers(0, n_oct - 2, F, dtype=np.int64)
                     .astype(np.int32))
    inline = jnp.asarray(rng.random(F) < 0.75)

    @jax.jit
    def g_all(occ, q0):
        return jnp.take(occ, q0, axis=0, mode="clip")

    @jax.jit
    def g_mask0(occ, q0, inline):
        idx = jnp.where(inline, 0, q0)
        return jnp.take(occ, idx, axis=0, mode="clip")

    t_all = bench_amp(g_all, (occ, q0))
    t_m = bench_amp(g_mask0, (occ, q0, inline))
    log(f"gather all-random: {t_all:6.2f} ms; 75%-clamped-to-row0: "
        f"{t_m:6.2f} ms")


if os.environ.get("PROBE_MASK0"):
    probe_mask0()
    sys.exit(0)


def probe_cumulative():
    """Stepwise cumulative expand build-up at hs shapes: find the
    non-gather fat (expand measures ~9 ms vs ~4.5 ms of row0 gather at
    stride 6)."""
    import jax
    import jax.numpy as jnp
    from salmon_tpu.mapping.lookup import fingerprint30
    from salmon_tpu.mapping.score import (INVALID_KEY, expand_occurrences,
                                          segment_carry_first)

    rng = np.random.default_rng(0)
    R, P, C = 16384, 12, 8
    F = R * P
    n_oct = 350_000_000 // 8
    occ = jnp.asarray(rng.integers(0, 2**31, (n_oct, 16),
                                   dtype=np.int64).astype(np.int32))
    start = jnp.asarray((rng.integers(0, n_oct - 2, (R, P),
                                      dtype=np.int64) * 8)
                        .astype(np.int32))
    count = jnp.asarray(np.minimum(
        1 + rng.geometric(0.6, (R, P)), 20).astype(np.int32))
    found = jnp.asarray(rng.random((R, P)) < 0.95)
    inl = jnp.asarray(rng.random((R, P)) < 0.75)
    itxp = jnp.asarray(rng.integers(0, 200000, (R, P),
                                    dtype=np.int64).astype(np.int32))
    ipf = jnp.asarray(rng.integers(0, 1 << 20, (R, P),
                                   dtype=np.int64).astype(np.int32))
    km = {
        "hi": jnp.asarray(rng.integers(0, 2**32, (R, P), dtype=np.int64)
                          .astype(np.uint32)),
        "lo": jnp.asarray(rng.integers(0, 2**32, (R, P), dtype=np.int64)
                          .astype(np.uint32)),
        "valid": jnp.asarray(np.ones((R, P), bool)),
        "is_fw": jnp.asarray(rng.random((R, P)) < 0.5),
    }
    lk = (start, count, found, inl, itxp, ipf)

    @jax.jit
    def v_full(km, lk, occ):
        return expand_occurrences(km, lk, occ, C, 1000, stride=6,
                                  tail_frac=64)

    @jax.jit
    def v_row0_realign(km, lk, occ):
        start, count, found, inl, itxp, ipf = lk
        q0 = (start >> 3).reshape(F)
        off = (start.reshape(F) & 7).astype(jnp.int32)
        cnt_c = jnp.minimum(count.reshape(F), C)
        row0 = jnp.take(occ, jnp.clip(q0, 0, None), axis=0, mode="clip")
        row0 = jnp.concatenate(
            [row0, jnp.zeros((F, 16), jnp.int32)], axis=1)
        txp_all = row0[:, 0::2]
        pf_all = row0[:, 1::2]
        txp_f = txp_all[:, 0:C]
        pf_f = pf_all[:, 0:C]
        for o in range(1, 8):
            m = (off == o)[:, None]
            txp_f = jnp.where(m, txp_all[:, o:o + C], txp_f)
            pf_f = jnp.where(m, pf_all[:, o:o + C], pf_f)
        c_idx = jnp.arange(C, dtype=jnp.int32)
        ovalid = (found.reshape(F)[:, None]
                  & (c_idx[None, :] < cnt_c[:, None]))
        return txp_f, pf_f, ovalid

    @jax.jit
    def v_plus_outputs(km, lk, occ):
        txp_f, pf_f, ovalid = v_row0_realign.__wrapped__(km, lk, occ)
        R_, P_ = km["hi"].shape
        txp = txp_f.reshape(R_, P_, C)
        tpos = (pf_f >> 1).reshape(R_, P_, C)
        tfwd = (pf_f & 1).astype(bool).reshape(R_, P_, C)
        is_sep = txp == jnp.int32(-1)

        def _comb(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va)

        seen, carried = jax.lax.associative_scan(
            _comb, (is_sep, tpos), axis=2)
        qfp30 = fingerprint30(km["hi"], km["lo"]).astype(jnp.int32)
        seg_ok = ~seen | (carried == qfp30[:, :, None])
        ovalid3 = ovalid.reshape(R_, P_, C) & ~is_sep & seg_ok
        orient_fw = km["is_fw"][:, :, None] == tfwd
        key = (txp.astype(jnp.uint32) << jnp.uint32(1)) | \
            orient_fw.astype(jnp.uint32)
        key = jnp.where(ovalid3, key, INVALID_KEY)
        rpos = jnp.broadcast_to(
            (jnp.arange(P_, dtype=jnp.int32) * 6)[None, :, None],
            (R_, P_, C))
        diag = jnp.where(orient_fw, tpos - rpos, tpos + rpos)
        return key, rpos, diag, ovalid3

    t_ra = bench_amp(v_row0_realign, (km, lk, occ))
    t_out = bench_amp(v_plus_outputs, (km, lk, occ))
    t_full = bench_amp(v_full, (km, lk, occ))
    log(f"row0+realign          : {t_ra:6.2f} ms")
    log(f"+sep-scan+outputs     : {t_out:6.2f} ms")
    log(f"full expand (w/ tail) : {t_full:6.2f} ms")


if os.environ.get("PROBE_CUMUL"):
    probe_cumulative()
    sys.exit(0)
