"""Banded affine-gap alignment scoring (selective alignment).

Reference: PuffAligner + ksw2 banded SIMD Smith-Waterman (consumed at
src/quant/SalmonQuantify.cpp:1523-1525; config initMapperSettings,
SalmonMappingUtils.hpp:153-223: ma=2 mp=-4 go=6 ge=2, bandwidth=15,
refExtendLength=20, score-only). The reference validates every candidate
mapping with a banded DP and filters on minScoreFraction of the perfect
score (SalmonDefaults.hpp:33).

TPU design: score-only banded DP in *band-relative* coordinates. For a
candidate whose seed chain predicts the read starts at reference position
`pos`, read base i should align near ref position pos + i; the DP state is
H[i, d] for band offset d in [-bw, bw] (ref pos = pos + i + d). One
lax.scan step per read base:

  diag move   keeps d        -> H_prev[d] + sub(read_i, ref_{i+d})
  gap-in-read (ref advances) -> comes from d+1 in the previous row
  gap-in-ref  (read advances)-> within-row max-plus prefix over d,
                                computed with a Kogge-Stone shift-max
                                cascade (the ksw2 "lazy-F" loop as a
                                log-depth scan)

The scan is vectorized over all (fragment, candidate, mate) problems at
once — every step is pure VPU work on a (problems, band) tensor. Read is
global (no softclip by default), reference ends are free within the band
(the reference's extension-alignment semantics); bases outside the
transcript score a large negative, which enforces the default
no-overhang policy (softclipOverhangs=false).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9
OOB_PENALTY = -1000.0  # aligning outside the transcript (overhang)

# problems per Pallas program instance (lane tile)
PALLAS_TILE = 512


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _subst_scores(read_codes, ref_codes, ma: float, mp: float,
                  oob_score: float = OOB_PENALTY):
    """(P, B) substitution scores; invalid bases (>=4) mismatch, ref OOB
    heavily penalized (code 5) unless overhang softclip is on
    (oob_score=0: the overhanging base is clipped for free)."""
    is_oob = ref_codes >= 5
    match = (read_codes == ref_codes) & (read_codes < 4) & (ref_codes < 4)
    s = jnp.where(match, ma, mp)
    return jnp.where(is_oob, oob_score, s)


def banded_scores(read_codes, read_lens, ref_base, txp_lens, seq_codes,
                  seq_off, bandwidth: int, ma: float, mp: float,
                  go: float, ge: float, **kw):
    """Score-only banded affine DP for a batch of problems.

    Args:
      read_codes: (P, L) uint8 read codes, already orientation-resolved
        (rc reads pre-complemented so the alignment is always read-fw vs
        ref-fw). A problem's content may start at a nonzero row
        (kw read_starts: (P,) first active row, default 0) — flip-based
        reverse complements park ragged reads at the RIGHT edge of the
        row, avoiding the per-element re-gather a left-aligned rc needs.
      read_lens: (P,) int32.
      ref_base: (P,) int32 predicted read-start position on the
        transcript (may be negative or past the end; OOB masked).
      txp_lens: (P,) transcript lengths.
      seq_codes: (total_len,) concatenated transcript codes (uint8).
      seq_off: (P,) int64/int32 start offset of each problem's transcript
        in seq_codes.
      bandwidth: band half-width (static).
      ma/mp/go/ge: match / mismatch / gap-open / gap-extend scores
        (mp negative; go, ge positive costs).

    Returns (P,) float32 best alignment scores (read fully aligned).
    """
    return _banded_scores_impl(read_codes, None, read_lens, ref_base,
                               txp_lens, seq_codes, seq_off, bandwidth,
                               ma, mp, go, ge, **kw)


def banded_scores_indexed(reads, read_ids, read_lens, ref_base, txp_lens,
                          seq_codes, seq_off, bandwidth: int, ma: float,
                          mp: float, go: float, ge: float, **kw):
    """banded_scores variant where problems share read rows: `reads` is
    (NR, L) and `read_ids` (P,) selects each problem's read — avoids
    materializing a (P, L) read tensor when many candidates share one
    read."""
    return _banded_scores_impl(reads, read_ids, read_lens, ref_base,
                               txp_lens, seq_codes, seq_off, bandwidth,
                               ma, mp, go, ge, **kw)


def pack_seq4(seq_codes: np.ndarray, lead_pad: int = 256):
    """Pack base codes 2-bit, 16 per uint32 word, rows of 8 words (128
    bases, 32 bytes — this backend's efficient gather granule), with
    `lead_pad` zero bases prepended (so window fetch arithmetic never
    goes negative). Returns ((n_rows, 8) uint32 word matrix,
    offset_shift=lead_pad).

    2-bit halves the DP window fetch vs the previous 4-bit nibbles
    (2 row gathers instead of 4 for a W=130 band window — the fetch is
    issue+byte bound, probe_r5_dp2.py). N bases (code 4) have no 2-bit
    encoding; they pack as the position-derived base (i & 3). Ns can
    never be SEEDED (k-mer windows containing them are never indexed),
    so a DP band can only brush one through a nearby candidate; the
    pseudo-random fill mismatches ~3/4 of read bases, approximating the
    reference's all-mismatch N scoring with a bounded +2/base
    overestimate on band edges."""
    codes = np.asarray(seq_codes, np.uint8)
    fill = (np.arange(codes.shape[0], dtype=np.int64) & 3).astype(
        np.uint8)
    codes = np.where(codes < 4, codes, fill)
    padded = np.concatenate([
        np.zeros(lead_pad, np.uint8), codes, np.zeros(256, np.uint8)])
    n = padded.shape[0]
    n128 = -(-n // 128) * 128
    padded = np.pad(padded, (0, n128 - n))
    duo = padded.reshape(-1, 16).astype(np.uint32)
    words = np.zeros(duo.shape[0], dtype=np.uint32)
    for j in range(16):
        words |= duo[:, j] << np.uint32(2 * j)
    return words.reshape(-1, 8), lead_pad


def _fetch_windows_packed(seq_word_rows, a0, W: int):
    """(P,) absolute window starts -> (P, W) base codes.

    Fetch path: ROW gathers from the (n_rows, 8) word matrix (each row =
    128 bases) — per-element 1-D gathers on this backend run ~8ns/elem,
    row gathers ~4x faster — then an 8-way word-alignment select, an
    in-register 2-bit unpack, and a 16-way base-alignment select.
    """
    n_words = (W + 15) // 16 + 1
    n_rows = (n_words + 7) // 8 + 1
    P = a0.shape[0]
    # a0 may be int64 (concatenated references beyond 2^31 bases); the
    # word-row index fits int32 up to 2^31 rows = 274 Gb of sequence
    w0 = a0 >> 4
    r0 = (w0 >> 3).astype(jnp.int32)
    ridx = r0[:, None] + jnp.arange(n_rows, dtype=jnp.int32)[None, :]
    rows = jnp.take(seq_word_rows, ridx, axis=0,
                    mode="clip")                     # (P, n_rows, 8)
    flat_w = rows.reshape(P, n_rows * 8)
    # word alignment within the fetched rows
    wsel = (w0 & 7).astype(jnp.int32)
    w_al = flat_w[:, 0:n_words]
    for s in range(1, 8):
        w_al = jnp.where((wsel == s)[:, None],
                         flat_w[:, s:s + n_words], w_al)
    # unpack 2-bit codes -> (P, n_words * 16) bases
    bas = jnp.stack([(w_al >> jnp.uint32(2 * j)) & jnp.uint32(0x3)
                     for j in range(16)], axis=-1).reshape(
        P, n_words * 16).astype(jnp.int8)
    # base alignment within the first word
    shift = (a0 & 15).astype(jnp.int32)
    out = bas[:, 0:W]
    for s in range(1, 16):
        out = jnp.where((shift == s)[:, None], bas[:, s:s + W], out)
    return out


def _banded_scores_impl(read_codes, read_ids, read_lens, ref_base,
                        txp_lens, seq_codes, seq_off, bandwidth: int,
                        ma: float, mp: float, go: float, ge: float,
                        seq_words=None, seq_words_shift: int = 0,
                        softclip: bool = False,
                        softclip_overhangs: bool = False,
                        read_starts=None):
    if read_ids is None:
        P, L = read_codes.shape
    else:
        P = read_ids.shape[0]
        L = read_codes.shape[1]
    if read_starts is None:
        read_starts = jnp.zeros(read_lens.shape, jnp.int32)
    B = 2 * bandwidth + 1
    d_off = jnp.arange(B, dtype=jnp.int32) - bandwidth  # [-bw, bw]

    # Gather every problem's reference WINDOW once, contiguously:
    # window position w corresponds to ref position ref_base - bw + w,
    # so the band for read row i is the static-size slice [i, i + B).
    # Inside the scan this is a dynamic_slice — no per-step gathers.
    W = L + B - 1
    w_idx = ref_base[:, None] + (jnp.arange(W, dtype=jnp.int32)
                                 - bandwidth)[None, :]
    w_oob = (w_idx < 0) | (w_idx >= txp_lens[:, None])
    if seq_words is not None:
        # keep the absolute base offset in seq_off's dtype (int64 for
        # concatenated references beyond 2^31 bases)
        a0 = seq_off + (ref_base - bandwidth
                        + seq_words_shift).astype(seq_off.dtype)
        ref_win = _fetch_windows_packed(seq_words, jnp.maximum(a0, 0), W)
    else:
        ref_win = jnp.take(seq_codes,
                           jnp.clip(seq_off[:, None] + w_idx, 0,
                                    seq_codes.shape[0] - 1),
                           mode="clip").astype(jnp.int8)
    ref_win = jnp.where(w_oob, jnp.int8(5), ref_win)  # (P, W)
    # --softclipOverhangs: bases hanging off the transcript ends are
    # clipped for free instead of penalized (reference
    # aconf.allowOverhangSoftclip, SalmonMappingUtils.hpp:195)
    oob_score = 0.0 if softclip_overhangs else OOB_PENALTY

    if read_ids is not None:
        reads_p = jnp.take(read_codes, read_ids, axis=0, mode="clip")
    else:
        reads_p = read_codes

    # transpose so the (large) problems axis rides the vector lanes and
    # the band rides sublanes: state tensors are (B, P)
    ref_win_t = ref_win.T          # (W, P)
    reads_t = reads_p.T            # (L, P)

    if _use_pallas():
        return _banded_scores_pallas(reads_t, ref_win_t, read_lens,
                                     bandwidth, ma, mp, go, ge,
                                     softclip=softclip,
                                     oob_score=oob_score,
                                     read_starts=read_starts)

    n_shift = int(np.ceil(np.log2(max(B, 2))))

    def step(carry, i):
        H_prev, F_prev, Hmax_prev = carry     # (B, P)
        rc = jax.lax.dynamic_slice_in_dim(reads_t, i, 1,
                                          axis=0).astype(jnp.int32)
        refs = jax.lax.dynamic_slice_in_dim(ref_win_t, i, B,
                                            axis=0).astype(jnp.int32)
        sub = _subst_scores(rc, refs, ma, mp, oob_score)

        # gap-in-read: ref consumed without read base — comes from the
        # previous row at band offset d+1
        shift_dn = lambda a: jnp.concatenate(
            [a[1:, :], jnp.full((1, P), NEG, a.dtype)], axis=0)
        F = jnp.maximum(shift_dn(F_prev) - ge,
                        shift_dn(H_prev) - go - ge)
        H_diag = H_prev + sub
        H_nf = jnp.maximum(H_diag, F)

        # gap-in-ref (E): within-row max-plus prefix over the band:
        # H[d] = max(H_nf[d], max_{d'<d} H_nf[d'] - go - ge*(d - d'))
        X = H_nf - go
        s = 1
        for _ in range(n_shift):
            shifted = jnp.concatenate(
                [jnp.full((s, P), NEG, X.dtype), X[:-s, :]], axis=0)
            X = jnp.maximum(X, shifted - ge * s)
            s *= 2
        E = jnp.concatenate(
            [jnp.full((1, P), NEG, X.dtype), X[:-1, :]], axis=0) - ge
        H = jnp.maximum(H_nf, E)
        if softclip:
            # --softclip: read ends may be clipped for free; clamping at
            # zero makes every cell a legal alignment start (and the
            # running max below a legal end) — Smith-Waterman-style free
            # read ends (reference aconf.allowSoftclip)
            H = jnp.maximum(H, 0.0)

        # rows outside the content window must not change the final
        # score: freeze (content may start at a nonzero row for
        # flip-based reverse complements)
        active = ((i >= read_starts)
                  & (i < read_starts + read_lens))[None, :]
        H = jnp.where(active, H, H_prev)
        F = jnp.where(active, F, F_prev)
        Hmax = jnp.maximum(Hmax_prev, jnp.where(active, H, NEG))
        return (H, F, Hmax), None

    # derive the initial carry from an input so its sharding "varying"
    # status matches the loop body under shard_map
    zero_like_in = (0.0 * ref_base.astype(jnp.float32))[None, :]
    H0 = jnp.zeros((B, P), jnp.float32) + zero_like_in
    F0 = jnp.full((B, P), NEG, jnp.float32) + zero_like_in
    (H, _, Hmax), _ = jax.lax.scan(step, (H0, F0, H0 + NEG),
                                   jnp.arange(L))
    # softclip: the best alignment may end mid-read (free suffix clip)
    return jnp.max(Hmax if softclip else H, axis=0)


def _banded_scores_pallas(reads_t, ref_win_t, read_lens, bandwidth: int,
                          ma: float, mp: float, go: float, ge: float,
                          softclip: bool = False,
                          oob_score: float = OOB_PENALTY,
                          read_starts=None):
    """Pallas TPU kernel for the banded DP.

    The H/F wavefront lives in VMEM scratch across the whole read scan in
    BAND coordinates (B rows, padded to B8). Each problem tile's FULL
    reference window stays resident in VMEM (~76 KB at PT=512); a grid
    step covering read rows [lb*8, lb*8+8) loads the aligned
    (B8 + 8)-row block starting at lb*8 (dynamic sublane starts must be
    8-aligned under Mosaic) and slices row j's band [j, j+B8) statically
    from the loaded value — register-level rotates, no pre-skewed slab.
    (The previous XLA-side skew materialized an L8*B8-row gather,
    ~3.4 ms at bench shapes — over half the DP stage; probe_r5_dp.py.)

    Grid: (problem_tiles, L/8); scratch persists across the sequential
    TPU grid, re-initialized when a new tile starts.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, P = reads_t.shape
    B = 2 * bandwidth + 1
    B8 = -(-B // 8) * 8
    BLK = B8 + 8
    W = ref_win_t.shape[0]
    PT = PALLAS_TILE
    n_tiles = -(-P // PT)
    Pp = n_tiles * PT
    L8 = -(-L // 8) * 8
    nL8 = L8 // 8
    reads_t = jnp.pad(reads_t, ((0, L8 - L), (0, Pp - P)),
                      constant_values=4)
    ref_win_t = jnp.pad(ref_win_t,
                        ((0, L8 + BLK - W), (0, Pp - P)),
                        constant_values=5)
    if read_starts is None:
        read_starts = jnp.zeros(read_lens.shape, jnp.int32)
    # rows 0/1: [first active row, one past last active row]
    lens_row = jnp.stack(
        [jnp.pad(read_starts, (0, Pp - P)),
         jnp.pad(read_starts + read_lens, (0, Pp - P))],
        axis=0)

    n_shift = int(np.ceil(np.log2(max(B, 2))))

    def kernel(lens_ref, reads_ref, ref_ref, out_ref, H_s, F_s, M_s):
        lb = pl.program_id(1)

        @pl.when(lb == 0)
        def _():
            H_s[:, :] = jnp.zeros((B8, PT), jnp.float32)
            F_s[:, :] = jnp.full((B8, PT), NEG, jnp.float32)
            M_s[:, :] = jnp.full((B8, PT), NEG, jnp.float32)

        lo = lens_ref[0:1, :]
        hi = lens_ref[1:2, :]
        H = H_s[:, :]
        F = F_s[:, :]
        Hm = M_s[:, :]
        neg_row = jnp.full((1, PT), NEG, jnp.float32)
        # this step's ref rows [lb*8, lb*8 + BLK): aligned dynamic load
        blk = ref_ref[pl.ds(lb * 8, BLK), :]
        # band rows beyond B-1 are inert (2-D iota: Mosaic rejects 1-D
        # iota reshapes)
        dpad = jax.lax.broadcasted_iota(jnp.int32, (B8, PT), 0) >= B

        for j in range(8):
            i = lb * 8 + j
            rc = reads_ref[j:j + 1, :].astype(jnp.int32)       # (1, PT)
            refs = jax.lax.slice_in_dim(blk, j, j + B8,
                                        axis=0).astype(jnp.int32)
            match = (rc == refs) & (rc < 4) & (refs < 4)
            sub = jnp.where(match, ma, mp)
            sub = jnp.where(refs >= 5, oob_score, sub)
            sub = jnp.where(dpad, oob_score, sub)

            # gap-in-read: previous row at band offset d+1
            F_n = jnp.maximum(
                jnp.concatenate([F[1:, :], neg_row], axis=0) - ge,
                jnp.concatenate([H[1:, :], neg_row], axis=0) - go - ge)
            H_nf = jnp.maximum(H + sub, F_n)

            # gap-in-ref: within-row max-plus prefix over the band
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
            if softclip:
                H_new = jnp.maximum(H_new, 0.0)

            active = (i >= lo) & (i < hi)
            H = jnp.where(active, H_new, H)
            F = jnp.where(active, F_n, F)
            Hm = jnp.maximum(Hm, jnp.where(active, H, NEG))

        H_s[:, :] = H
        F_s[:, :] = F
        M_s[:, :] = Hm

        @pl.when(lb == nL8 - 1)
        def _():
            out_ref[0:1, :] = jnp.max(Hm if softclip else H, axis=0,
                                      keepdims=True)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, nL8),
        in_specs=[
            pl.BlockSpec((2, PT), lambda t, l: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, PT), lambda t, l: (l, t),
                         memory_space=pltpu.VMEM),
            # whole per-tile ref window resident in VMEM (constant in
            # l, so Pallas skips re-copies)
            pl.BlockSpec((L8 + BLK, PT), lambda t, l: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PT), lambda t, l: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B8, PT), jnp.float32),
                        pltpu.VMEM((B8, PT), jnp.float32),
                        pltpu.VMEM((B8, PT), jnp.float32)],
    )(lens_row, reads_t, ref_win_t)
    return out.reshape(-1)[:P]


def banded_scores_numpy(read, ref, bandwidth, ma, mp, go, ge,
                        softclip=False, softclip_overhangs=False,
                        read_start=0, read_len=None):
    """Unvectorized float reference DP for tests: same band semantics.

    read/ref: code arrays; ref indexed so read[i] aligns near ref[i].
    Rows outside [read_start, read_start + read_len) are frozen (the
    flip-based rc layout parks content at the right edge of the row).
    """
    L = len(read)
    if read_len is None:
        read_len = L - read_start
    B = 2 * bandwidth + 1
    H = np.zeros(B)
    F = np.full(B, NEG)
    hmax = NEG
    for i in range(L):
        if not (read_start <= i < read_start + read_len):
            continue
        Hn = np.full(B, NEG)
        Fn = np.full(B, NEG)
        for db in range(B):
            d = db - bandwidth
            j = i + d
            if 0 <= j < len(ref):
                sub = ma if (read[i] == ref[j] and read[i] < 4
                             and ref[j] < 4) else mp
                if read[i] >= 4 or ref[j] >= 4:
                    sub = mp
            else:
                sub = 0.0 if softclip_overhangs else OOB_PENALTY
            # diag
            best = H[db] + sub
            # gap in read (from previous row, d+1)
            if db + 1 < B:
                Fn[db] = max(F[db + 1] - ge, H[db + 1] - go - ge)
                best = max(best, Fn[db])
            Hn[db] = best
        # gap in ref: within-row max-plus prefix over the pre-E values
        pre = Hn.copy()
        for db in range(1, B):
            best_e = NEG
            for dp in range(db):
                best_e = max(best_e, pre[dp] - go - ge * (db - dp))
            Hn[db] = max(Hn[db], best_e)
        if softclip:
            Hn = np.maximum(Hn, 0.0)
        H, F = Hn, Fn
        hmax = max(hmax, H.max())
    return hmax if softclip else H.max()
