"""Device-side alignment error model (TPU hot path for `-a` mode).

Reference: AlignmentModel::update / logLikelihood
(include/salmon/internal/alignment/AlignmentModel.hpp:10-84,
src/alignment/AlignmentModel.cpp) — per-read-position-bin 82x82
transition matrices, likelihood = sum(log P(cur|prev)) minus the
(0,0)->(0,0) background, learned with posterior-weighted updates in
processMiniBatch (src/alignment/SalmonQuantifyAlignments.cpp:126).

TPU design: the numpy model (errormodel.py) walks ragged CIGAR columns
on the host — vectorized, but still ~200 ns/column and 85% of `-a`-mode
runtime. Here every record is ONE ROW of a fixed (N, C) grid and the
whole CIGAR expansion runs inside one jitted program:

  * per-column op index = rank of the column in the record's cumulative
    op-length vector (a (P,)-wide comparison sum, P = 16 padded ops),
  * read/ref cursors = masked prefix sums along the row,
  * read/ref bases = one take_along_axis per side,
  * transition states = tiny-table lookups; prev = a row shift
    (column 0 is the START state — no ragged segment boundaries),
  * update: one flat scatter-add into the [bins*82*82] count vector,
  * likelihood: one flat gather from the normalized log-prob vector,
    summed along the row (fg - bg per reference logLikelihood).

Records that do not fit the grid (cigar_n > 16 ops or more than C
aligned columns) fall back to the numpy walk; their count/likelihood
contributions merge exactly (the split is by record). Counts live on
the device between batches; normalize() is a device log-softmax.
"""

from __future__ import annotations

import numpy as np

from salmon_tpu.alignment.errormodel import (ALN_DASH, ALN_HARD,
                                             ALN_PAD, ALN_SKIP,
                                             ALN_SOFT, N_BINS, N_FULL,
                                             N_STATES, START_STATE,
                                             AlignmentErrorModel,
                                             expand_batch)

MAXOPS = 16           # padded CIGAR ops per record (P)
COL_SLACK = 48        # extra columns beyond the longest read (indels)
N_FLAT = N_BINS * N_FULL * N_FULL
SENTINEL = N_FLAT     # invalid-column key (one extra scatter bucket)

# per-op consume flags and state overrides (MIDNSHP=X; -1 = use base)
_CONS_READ = np.array([1, 1, 0, 0, 1, 0, 0, 1, 1], np.int32)
_CONS_REF = np.array([1, 0, 1, 1, 0, 0, 0, 1, 1], np.int32)
_RB_OVR = np.array([-1, ALN_DASH, -1, -1, ALN_SOFT, ALN_HARD,
                    ALN_PAD, -1, -1], np.int32)
_QB_OVR = np.array([-1, -1, ALN_DASH, ALN_SKIP, -1, ALN_HARD,
                    ALN_PAD, -1, -1], np.int32)


def _expand_keys(ops, oplens, rseq, rlen, toff, pos, tlen, seq_codes):
    """(N, C) flattened transition keys + validity, all in-graph."""
    import jax.numpy as jnp

    N, P = ops.shape
    C = rseq.shape[1] + COL_SLACK
    cum = jnp.cumsum(oplens, axis=1)                      # (N, P)
    colj = jnp.arange(C, dtype=jnp.int32)
    # op index of each column: how many ops end at or before it
    opidx = jnp.sum((cum[:, :, None] <= colj[None, None, :])
                    .astype(jnp.int32), axis=1)           # (N, C)
    valid = colj[None, :] < cum[:, -1:]
    # op value per column (P is tiny: select-sum instead of gather)
    opv = jnp.zeros((N, C), jnp.int32)
    for p in range(P):
        opv = opv + ops[:, p:p + 1] * (opidx == p)
    opv = jnp.clip(opv, 0, 8)

    cr = jnp.take(jnp.asarray(_CONS_READ), opv) * valid
    cf = jnp.take(jnp.asarray(_CONS_REF), opv) * valid
    readcur = jnp.cumsum(cr, axis=1) - cr                 # exclusive
    refcur = jnp.cumsum(cf, axis=1) - cf

    rl = jnp.maximum(rlen[:, None], 1)
    read_base = jnp.take_along_axis(
        rseq, jnp.minimum(readcur, rl - 1), axis=1).astype(jnp.int32)
    rpos = pos[:, None] + refcur
    ref_ok = (rpos >= 0) & (rpos < tlen[:, None])
    gidx = jnp.clip(toff[:, None] + rpos, 0, seq_codes.shape[0] - 1)
    ref_base = jnp.where(ref_ok,
                         jnp.take(seq_codes, gidx).astype(jnp.int32), 4)

    rb_o = jnp.take(jnp.asarray(_RB_OVR), opv)
    qb_o = jnp.take(jnp.asarray(_QB_OVR), opv)
    rb = jnp.clip(jnp.where(rb_o >= 0, rb_o, ref_base), 0,
                  N_STATES - 1)
    qb = jnp.clip(jnp.where(qb_o >= 0, qb_o, read_base), 0,
                  N_STATES - 1)
    cur = rb * N_STATES + qb
    prev = jnp.concatenate(
        [jnp.full((N, 1), START_STATE, jnp.int32), cur[:, :-1]], axis=1)
    prev = jnp.where(valid, prev, START_STATE)

    pbin = jnp.minimum((readcur * N_BINS) // rl, N_BINS - 1)
    key = pbin * (N_FULL * N_FULL) + prev * N_FULL + cur
    key = jnp.where(valid, key, SENTINEL)
    return key, valid


def _count_update(ops, oplens, rseq, rlen, toff, pos, tlen, w,
                  seq_codes):
    import jax.numpy as jnp
    key, valid = _expand_keys(ops, oplens, rseq, rlen, toff, pos, tlen,
                              seq_codes)
    wcol = jnp.where(valid, w[:, None], 0.0)
    add = jnp.zeros(N_FLAT + 1, jnp.float32).at[key.ravel()].add(
        wcol.ravel())
    return add[:N_FLAT]


def _log_likelihood(ops, oplens, rseq, rlen, toff, pos, tlen, lp_flat,
                    lp_bg, seq_codes):
    import jax.numpy as jnp
    key, valid = _expand_keys(ops, oplens, rseq, rlen, toff, pos, tlen,
                              seq_codes)
    fg = jnp.take(jnp.concatenate([lp_flat, jnp.zeros(1, jnp.float32)]),
                  key)
    pbin = key // (N_FULL * N_FULL)  # sentinel -> bin 4 (bg padded)
    bg = jnp.take(jnp.concatenate([lp_bg, jnp.zeros(1, jnp.float32)]),
                  jnp.minimum(pbin, N_BINS))
    return jnp.sum(jnp.where(valid, fg - bg, 0.0), axis=1)


# --- fused batch path: expand ONCE per batch (both mates in one grid),
# then reuse the device-resident keys for likelihood and update. Keys
# carry the mate: key_full = mate*N_FLAT + key; 2*N_FLAT = sentinel.

def _expand_fused(ops, oplens, rseq, rlen, toff, pos, tlen, mate,
                  seq_codes):
    import jax.numpy as jnp
    key, valid = _expand_keys(ops, oplens, rseq, rlen, toff, pos, tlen,
                              seq_codes)
    return jnp.where(valid, mate[:, None] * N_FLAT + key,
                     2 * N_FLAT)


def _ll_keys(key_full, lp2_flat, lp2_bg):
    import jax.numpy as jnp
    valid = key_full < 2 * N_FLAT
    fg = jnp.take(jnp.concatenate([lp2_flat,
                                   jnp.zeros(1, jnp.float32)]),
                  key_full)
    # key_full // (82*82) == mate*N_BINS + bin exactly
    bg = jnp.take(jnp.concatenate([lp2_bg, jnp.zeros(1, jnp.float32)]),
                  jnp.minimum(key_full // (N_FULL * N_FULL),
                              2 * N_BINS))
    return jnp.sum(jnp.where(valid, fg - bg, 0.0), axis=1)


def _update_keys(key_full, w):
    import jax.numpy as jnp
    valid = key_full < 2 * N_FLAT
    wcol = jnp.where(valid, w[:, None], 0.0)
    add = jnp.zeros(2 * N_FLAT + 1, jnp.float32).at[
        key_full.ravel()].add(wcol.ravel())
    return add[:2 * N_FLAT].reshape(2, N_BINS, N_FULL, N_FULL)


class PreparedBatch:
    """Device keys for one batch's kept records, expanded once and
    shared by log_likelihood() and update() (the reference touches each
    alignment's CIGAR once per minibatch too)."""

    def __init__(self, model, b, i1, i2, ref_map):
        self.model = model
        self.b = b
        self.ref_map = ref_map
        self.paired = i2 is not None
        i1 = np.asarray(i1, np.int64)
        self.k = i1.size
        if self.paired:
            sel = np.concatenate([i1, np.asarray(i2, np.int64)])
            mate = np.repeat(np.array([0, 1], np.int32), self.k)
        else:
            sel = i1
            mate = np.zeros(self.k, np.int32)
        self.sel = sel
        self.mate = mate
        p, fits, n = model._pack(b, sel, ref_map)
        self.fits = fits
        self.n = n
        m = np.zeros(p["rlen"].shape[0], np.int32)
        m[:n] = mate
        self.keys = model._expand(p["ops"], p["oplens"], p["rseq"],
                                  p["rlen"], p["toff"], p["pos"],
                                  p["tlen"], m, model.seq_codes)
        self._rest_cols = None  # lazy numpy fallback expansion

    def _rest(self):
        if self._rest_cols is None:
            rest = ~self.fits
            self._rest_cols = {}
            for mt in (0, 1) if self.paired else (0,):
                rsel = rest & (self.mate == mt)
                if rsel.any():
                    self._rest_cols[mt] = (rsel, expand_batch(
                        self.b, self.sel[rsel], self.ref_map,
                        self.model._seq_host, self.model._seq_off,
                        self.model._txp_lens))
        return self._rest_cols

    def log_likelihood(self):
        """(k,) summed over mates, aligned with i1/i2."""
        model = self.model
        if model._logp is None:
            model.normalize()
        ll = np.zeros(self.sel.size)
        if self.fits.any():
            lv = np.asarray(model._ll_fused(
                self.keys, model._logp.reshape(-1),
                model._logp[:, :, 0, 0].reshape(-1))[:self.n])
            ll[self.fits] = lv[self.fits]
        for mt, (rsel, cols) in self._rest().items():
            ll[rsel] = model._np_eval.log_likelihood(
                cols, int(rsel.sum()), mt)
        return ll[:self.k] + (ll[self.k:] if self.paired else 0.0)

    def update(self, w):
        """Posterior-weighted count update; w aligned with i1/i2."""
        model = self.model
        w = np.asarray(w, np.float32)
        wfull = np.concatenate([w, w]) if self.paired else w
        if self.fits.any():
            wg = np.zeros(self.keys.shape[0], np.float32)
            wg[:self.n] = np.where(self.fits, wfull, 0.0)
            model.counts = model.counts + model._update_fused(
                self.keys, model._jnp.asarray(wg))
        for mt, (rsel, cols) in self._rest().items():
            model._np_model.update(cols, wfull[rsel], mt)
            model._np_dirty = True
        model._logp = None


class DeviceAlignmentErrorModel:
    """Drop-in functional twin of AlignmentErrorModel with the hot path
    jitted. Parity-tested against the numpy model
    (tests/test_alignment_device.py)."""

    def __init__(self, seq_codes, seq_off, txp_lens,
                 alpha: float = 1e-3, read_len_cap: int = 512):
        import jax
        import jax.numpy as jnp
        self._jnp = jnp
        self.alpha = alpha
        self._seq_host = np.asarray(seq_codes, np.uint8)
        self.seq_codes = jnp.asarray(self._seq_host.view(np.int8))
        self._seq_off = np.asarray(seq_off, np.int64)
        self._txp_lens = np.asarray(txp_lens, np.int64)
        self.counts = jnp.full((2, N_BINS, N_FULL, N_FULL), alpha,
                               jnp.float32)
        self._logp = None
        self._lp_bg = None
        self._np_eval_cache = None
        self.read_len_cap = read_len_cap
        self._rl_grid = 0      # current padded read length (grows)
        self._update = jax.jit(_count_update)
        self._ll = jax.jit(_log_likelihood)
        self._expand = jax.jit(_expand_fused)
        self._ll_fused = jax.jit(_ll_keys)
        self._update_fused = jax.jit(_update_keys)
        # numpy fallback for records that don't fit the grid
        self._np_model = AlignmentErrorModel(alpha=0.0)
        self._np_dirty = False

    # -- packing ------------------------------------------------------
    def _pack(self, b, sel, ref_map):
        """Fixed-shape host arrays for ALL sel records plus a fits
        mask. Rows that do not fit the grid (cigar ops > 16, read
        longer than the grid, or expanded columns past the slack) are
        zeroed — they contribute no valid columns on device — and are
        reprocessed by the numpy fallback. The ragged->padded repack is
        a native memcpy loop when libsalmontpu is available
        (native/bamreader.cpp bam_pad_batch)."""
        import ctypes

        from salmon_tpu.alignment.bamio import native_lib

        n = sel.size
        rl_all = b.read_len[sel].astype(np.int32)
        rl_max = min(int(rl_all.max()) if n else 1, self.read_len_cap)
        # grow-only grid width, padded to 64 (avoids jit churn)
        self._rl_grid = max(self._rl_grid, -(-rl_max // 64) * 64)
        RL = self._rl_grid
        # power-of-FOUR row buckets: every distinct shape costs an XLA
        # compile (~1.7 s each on the axon backend — 19 compiles once
        # dominated the whole alignment-mode bench run)
        npad = 4096
        while npad < n:
            npad <<= 2

        ops = np.zeros((npad, MAXOPS), np.int32)
        oplens = np.zeros((npad, MAXOPS), np.int32)
        rseq = np.zeros((npad, RL), np.int8)
        okb = np.zeros(npad, np.uint8)
        lib = native_lib()
        if lib is not None and hasattr(lib, "bam_pad_batch"):
            sel64 = np.ascontiguousarray(sel, np.int64)
            ptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
            lib.bam_pad_batch(
                ctypes.c_int64(n), ptr(sel64, ctypes.c_int64),
                ptr(np.ascontiguousarray(b.read_len, np.int32),
                    ctypes.c_int32),
                ptr(np.ascontiguousarray(b.seq_off, np.int64),
                    ctypes.c_int64),
                ptr(np.ascontiguousarray(b.seq_buf, np.uint8),
                    ctypes.c_uint8),
                ptr(np.ascontiguousarray(b.cigar_off, np.int64),
                    ctypes.c_int64),
                ptr(np.ascontiguousarray(b.cigar_n, np.int32),
                    ctypes.c_int32),
                ptr(np.ascontiguousarray(b.cigar_op, np.uint8),
                    ctypes.c_uint8),
                ptr(np.ascontiguousarray(b.cigar_oplen, np.uint32),
                    ctypes.c_uint32),
                ctypes.c_int32(RL), ctypes.c_int32(MAXOPS),
                ctypes.c_int32(RL + COL_SLACK),
                ptr(ops, ctypes.c_int32), ptr(oplens, ctypes.c_int32),
                ptr(rseq, ctypes.c_int8), ptr(okb, ctypes.c_uint8))
            fits = okb[:n].astype(bool)
        else:
            cn = b.cigar_n[sel].astype(np.int64)
            co = b.cigar_off[sel].astype(np.int64)
            opcols = np.arange(MAXOPS, dtype=np.int64)
            gather = np.minimum(co[:, None] + opcols,
                                max(b.cigar_op.size - 1, 0))
            opmask = (opcols[None, :] < cn[:, None]) & (
                cn[:, None] <= MAXOPS)
            ops_n = np.where(opmask, b.cigar_op[gather],
                             0).astype(np.int32)
            oplens_n = np.where(opmask, b.cigar_oplen[gather],
                                0).astype(np.int32)
            fits = ((cn > 0) & (cn <= MAXOPS) & (rl_all <= RL)
                    & (oplens_n.sum(axis=1) <= RL + COL_SLACK))
            ops_n[~fits] = 0
            oplens_n[~fits] = 0
            so = b.seq_off[sel].astype(np.int64)
            rcols = np.arange(RL, dtype=np.int64)
            sgather = np.minimum(so[:, None] + rcols,
                                 max(b.seq_buf.size - 1, 0))
            rmask = (rcols[None, :] < rl_all[:, None]) & fits[:, None]
            ops[:n] = ops_n
            oplens[:n] = oplens_n
            rseq[:n] = np.where(rmask, b.seq_buf[sgather],
                                0).astype(np.int8)

        txp = ref_map[np.clip(b.refid[sel], 0, ref_map.size - 1)]
        toff = self._seq_off[np.clip(txp, 0, self._seq_off.size - 2)]
        tlen = self._txp_lens[np.clip(txp, 0, self._txp_lens.size - 1)]

        def pad(a, dtype):
            out = np.zeros(npad, dtype)
            out[:n] = a
            return out

        return {
            "ops": ops, "oplens": oplens, "rseq": rseq,
            "rlen": pad(np.minimum(rl_all, RL), np.int32),
            "toff": pad(toff, np.int64),
            "pos": pad(b.pos[sel], np.int32),
            "tlen": pad(tlen, np.int32),
        }, fits, n

    # -- model interface ----------------------------------------------
    def prepare(self, b, i1, i2, ref_map) -> "PreparedBatch":
        """Expand one batch's kept records (both mates fused) once;
        the returned handle serves log_likelihood() and update()."""
        return PreparedBatch(self, b, i1, i2, ref_map)

    def update(self, b, sel_idx, ref_map, weights, mate: int) -> None:
        """Posterior-weighted transition-count update for the records
        sel_idx of batch b (weights aligned with sel_idx)."""
        import jax.numpy as jnp
        sel = np.asarray(sel_idx, np.int64)
        w = np.asarray(weights, np.float32)
        p, fits, n = self._pack(b, sel, ref_map)
        if fits.any():
            wg = np.zeros(p["rlen"].shape[0], np.float32)
            wg[:n] = np.where(fits, w, 0.0)
            add = self._update(p["ops"], p["oplens"], p["rseq"],
                               p["rlen"], p["toff"], p["pos"],
                               p["tlen"], jnp.asarray(wg),
                               self.seq_codes)
            self.counts = self.counts.at[mate].add(
                add.reshape(N_BINS, N_FULL, N_FULL))
        rest = ~fits
        if rest.any():
            cols = expand_batch(b, sel[rest], ref_map, self._seq_host,
                                self._seq_off, self._txp_lens)
            self._np_model.update(cols, w[rest], mate)
            self._np_dirty = True
        self._logp = None

    def normalize(self) -> None:
        jnp = self._jnp
        counts = self.counts
        if self._np_dirty:
            counts = counts + jnp.asarray(
                self._np_model.counts.astype(np.float32))
            self.counts = counts
            self._np_model.counts[:] = 0.0
            self._np_dirty = False
        tot = jnp.sum(counts, axis=3, keepdims=True)
        self._logp = jnp.log(counts / jnp.maximum(tot, 1e-30))
        # background per (mate, bin): the (0,0)->(0,0) transition
        self._lp_bg = self._logp[:, :, 0, 0]
        self._np_eval_cache = None

    @property
    def _np_eval(self):
        """Numpy mirror for the grid-overflow fallback (lazy: only
        built when a batch actually contains overflow records)."""
        if self._np_eval_cache is None:
            m = AlignmentErrorModel(alpha=0.0)
            m.counts = np.asarray(self.counts, np.float64)
            m.normalize()
            self._np_eval_cache = m
        return self._np_eval_cache

    def log_likelihood(self, b, sel_idx, ref_map, mate: int):
        """Per-record fg-bg log-likelihood, aligned with sel_idx."""
        if self._logp is None:
            self.normalize()
        sel = np.asarray(sel_idx, np.int64)
        out = np.zeros(sel.size)
        p, fits, n = self._pack(b, sel, ref_map)
        if fits.any():
            ll = self._ll(p["ops"], p["oplens"], p["rseq"], p["rlen"],
                          p["toff"], p["pos"], p["tlen"],
                          self._logp[mate].ravel(), self._lp_bg[mate],
                          self.seq_codes)
            lv = np.asarray(ll[:n])
            out[fits] = lv[fits]
        rest = ~fits
        if rest.any():
            cols = expand_batch(b, sel[rest], ref_map, self._seq_host,
                                self._seq_off, self._txp_lens)
            out[rest] = self._np_eval.log_likelihood(
                cols, int(rest.sum()), mate)
        return out
