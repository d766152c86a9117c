"""Alignment error model: per-position-bin transition matrices.

Reference: AlignmentModel (include/salmon/internal/alignment/
AlignmentModel.hpp, src/alignment/AlignmentModel.cpp): alignment columns
are encoded as states refBase*9 + readBase over the 9-symbol alphabet
{A,C,G,T,-,S,H,P,N} (AlignmentCommon.hpp:38-46 + setBasesFromCIGAROp_);
the model is P(curState | prevState) per read-position bin (4 bins),
left/right mates separate; the likelihood of an alignment is
sum(log P(cur|prev)) minus the same-length background of (0,0)->(0,0)
transitions. Learned during burn-in with posterior-weighted updates.

TPU/host design: the CIGAR walk is vectorized with numpy repeat/cumsum
over a whole record batch at once (no per-record Python loop); counts and
likelihood evaluation are flat bincount / gather-sum over the aligned
columns.
"""

from __future__ import annotations

import numpy as np

N_STATES = 9
N_FULL = 82          # 81 pair states + START
START_STATE = 81
N_BINS = 4
ALN_DASH = 4
ALN_SOFT = 5
ALN_HARD = 6
ALN_PAD = 7
ALN_SKIP = 8

# BAM cigar ops: MIDNSHP=X
_CONSUMES_READ = np.array([1, 1, 0, 0, 1, 0, 0, 1, 1], dtype=np.int64)
_CONSUMES_REF = np.array([1, 0, 1, 1, 0, 0, 0, 1, 1], dtype=np.int64)


def expand_batch(b, sel_idx, ref_map, seq_codes, seq_off, txp_lens):
    """Expand selected BAM records into per-aligned-column state arrays.

    Args:
      b: BamBatch; sel_idx: record indices to expand; ref_map: BAM ref ->
      txp id; seq_codes/seq_off/txp_lens: concatenated target sequences.

    Returns dict with (n_cols,) arrays: aln (record ordinal in sel_idx),
    prev, cur (state ids), bin (read-position bin), all int32.
    """
    if sel_idx.size == 0:
        return {k: np.zeros(0, np.int32)
                for k in ("aln", "prev", "cur", "bin")}
    n = sel_idx.size
    # flatten each record's cigar ops into columns
    c_off = b.cigar_off[sel_idx]
    c_n = b.cigar_n[sel_idx]
    total_ops = int(c_n.sum())
    op_rec = np.repeat(np.arange(n), c_n)
    op_idx = np.concatenate([np.arange(o, o + k) for o, k in
                             zip(c_off, c_n)]) if total_ops else \
        np.zeros(0, np.int64)
    ops = b.cigar_op[op_idx].astype(np.int64)
    oplens = b.cigar_oplen[op_idx].astype(np.int64)

    col_rec = np.repeat(op_rec, oplens)
    col_op = np.repeat(ops, oplens)
    n_cols = col_rec.size
    if n_cols == 0:
        return {k: np.zeros(0, np.int32)
                for k in ("aln", "prev", "cur", "bin")}

    # per-column read/ref cursors: cumsum of consumes within each record
    cons_read = _CONSUMES_READ[np.clip(col_op, 0, 8)]
    cons_ref = _CONSUMES_REF[np.clip(col_op, 0, 8)]
    # record boundaries in column space
    cols_per_rec = np.zeros(n, dtype=np.int64)
    np.add.at(cols_per_rec, col_rec, 1)
    starts = np.concatenate([[0], np.cumsum(cols_per_rec)[:-1]])

    def seg_cumsum_excl(x):
        """Exclusive cumsum of x, restarted at each record boundary."""
        offs = np.concatenate([[0], np.cumsum(x)])[:-1]
        rec_base = offs[starts][col_rec]
        return offs - rec_base

    read_cursor = seg_cumsum_excl(cons_read)
    ref_cursor = seg_cumsum_excl(cons_ref)

    read_len = b.read_len[sel_idx].astype(np.int64)
    pos = b.pos[sel_idx].astype(np.int64)
    txp = ref_map[np.clip(b.refid[sel_idx], 0, ref_map.size - 1)]
    toff = seq_off[np.clip(txp, 0, seq_off.size - 2)].astype(np.int64)
    tlen = txp_lens[np.clip(txp, 0, txp_lens.size - 1)].astype(np.int64)

    rl = read_len[col_rec]
    seq_offsets = b.seq_off[sel_idx]
    read_base = b.seq_buf[
        seq_offsets[col_rec] + np.minimum(read_cursor, rl - 1)
    ].astype(np.int64)
    ref_pos = pos[col_rec] + ref_cursor
    ref_ok = (ref_pos >= 0) & (ref_pos < tlen[col_rec])
    ref_base = np.where(
        ref_ok,
        seq_codes[np.clip(toff[col_rec] + ref_pos, 0,
                          seq_codes.size - 1)].astype(np.int64), 4)

    # state symbols per CIGAR op (setBasesFromCIGAROp_)
    rb = np.where(col_op == 1, ALN_DASH, ref_base)        # I: ref dash
    rb = np.where(col_op == 4, ALN_SOFT, rb)              # S
    rb = np.where(col_op == 5, ALN_HARD, rb)              # H
    rb = np.where(col_op == 6, ALN_PAD, rb)               # P
    qb = np.where(col_op == 2, ALN_DASH, read_base)       # D: read dash
    qb = np.where(col_op == 3, ALN_SKIP, qb)              # N
    qb = np.where(col_op == 5, ALN_HARD, qb)              # H
    qb = np.where(col_op == 6, ALN_PAD, qb)               # P
    qb = np.clip(qb, 0, N_STATES - 1)
    rb = np.clip(rb, 0, N_STATES - 1)

    cur = (rb * N_STATES + qb).astype(np.int32)
    prev = np.empty_like(cur)
    prev[1:] = cur[:-1]
    prev[starts] = START_STATE
    is_start = np.zeros(n_cols, dtype=bool)
    is_start[starts] = True
    prev = np.where(is_start, START_STATE, prev)

    pbin = np.minimum((read_cursor * N_BINS) // np.maximum(rl, 1),
                      N_BINS - 1).astype(np.int32)
    return {"aln": col_rec.astype(np.int32), "prev": prev,
            "cur": cur.astype(np.int32), "bin": pbin}


class ONTErrorModel:
    """Oxford-Nanopore error model (reference ONTAlignmentModel,
    src/alignment/ONTAlignmentModel.cpp: per-100bp-length-bin error-rate
    histograms, Savitzky-Golay smoothed). Here: error rate = NM /
    aligned_length binned per length class; log-likelihood is the
    smoothed log-frequency of the observed rate in the read's bin."""

    BIN_LEN = 100          # reference binLen (ONTAlignmentModel.hpp:22)
    N_LEN_BINS = 62
    N_RATE_BINS = 101      # error rate percent 0..100

    def __init__(self, alpha: float = 1e-3):
        self.counts = np.full((self.N_LEN_BINS, self.N_RATE_BINS), alpha)
        self._logp = None

    @classmethod
    def _bins(cls, aln_len, nm):
        lb = np.clip(aln_len // cls.BIN_LEN, 0, cls.N_LEN_BINS - 1)
        rate = np.where(aln_len > 0, nm / np.maximum(aln_len, 1), 0.0)
        rb = np.clip(np.round(100 * rate), 0, cls.N_RATE_BINS - 1)
        return lb.astype(np.int64), rb.astype(np.int64)

    def update(self, aln_len, nm, weights):
        lb, rb = self._bins(aln_len, np.maximum(nm, 0))
        np.add.at(self.counts, (lb, rb), weights)
        self._logp = None

    def normalize(self):
        # 5-tap moving-average smoothing along the rate axis (the
        # SGSmooth role) then row-normalize
        k = np.ones(5) / 5.0
        sm = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, self.counts)
        self._logp = np.log(sm / sm.sum(axis=1, keepdims=True))

    def log_likelihood(self, aln_len, nm):
        if self._logp is None:
            self.normalize()
        lb, rb = self._bins(aln_len, np.maximum(nm, 0))
        return self._logp[lb, rb]


class AlignmentErrorModel:
    """Transition-count model with Laplace prior (reference alpha=1e-3
    default in AtomicMatrix)."""

    def __init__(self, alpha: float = 1e-3):
        self.counts = np.full((2, N_BINS, N_FULL, N_FULL), alpha)
        self._logp = None

    def update(self, cols: dict, weights: np.ndarray, mate: int) -> None:
        """cols from expand_batch; weights: (n_records,) posterior mass;
        mate: 0=left, 1=right."""
        if cols["aln"].size == 0:
            return
        w = weights[cols["aln"]]
        flat = (cols["bin"].astype(np.int64) * N_FULL * N_FULL
                + cols["prev"].astype(np.int64) * N_FULL + cols["cur"])
        add = np.bincount(flat, weights=w,
                          minlength=N_BINS * N_FULL * N_FULL)
        self.counts[mate] += add.reshape(N_BINS, N_FULL, N_FULL)
        self._logp = None

    def normalize(self) -> None:
        tot = self.counts.sum(axis=3, keepdims=True)
        self._logp = np.log(self.counts / np.maximum(tot, 1e-300))

    def log_likelihood(self, cols: dict, n_records: int,
                       mate: int) -> np.ndarray:
        """Per-record fg - bg log-likelihood (reference logLikelihood:
        bg uses the (0,0) self-transition per column)."""
        if self._logp is None:
            self.normalize()
        out = np.zeros(n_records)
        if cols["aln"].size == 0:
            return out
        lp = self._logp[mate]
        fg = lp[cols["bin"], cols["prev"], cols["cur"]]
        bg = lp[cols["bin"], 0, 0]
        np.add.at(out, cols["aln"], fg - bg)
        return out
