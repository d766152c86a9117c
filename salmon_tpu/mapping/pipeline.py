"""The jitted per-batch mapping pipeline (the reference's per-read hot loop,
src/quant/SalmonQuantify.cpp:1199-1845 processReads + processMiniBatch,
re-expressed as one fixed-shape tensor program).

Stages (all under a single jit):
  1. canonical k-mer extraction            (mapping.kmers)
  2. bounded-probe hash lookup             (mapping.lookup)
  3. occurrence expansion + run scoring    (mapping.score)
  4. mate pairing / orphan fallback        (mapping.pair)
  5. decoy-aware score filtering           (reference: MappingScoreInfo /
     filterAndCollectAlignments, SalmonMappingUtils.hpp:82-405)
  6. aux-probability weighting + eq-class tensor emission
     (reference: processMiniBatch, SalmonQuantify.cpp:599-857)

Outputs are fixed-shape per-batch tensors; equivalence classes are merged
across batches by the host accumulator (inference.eqclasses) and across
devices by psum (parallel.quant_step).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("salmon_tpu")

from salmon_tpu.constants import DEFAULTS, SalmonDefaults
from salmon_tpu.index.builder import TranscriptomeIndex
from salmon_tpu.mapping.kmers import extract_kmers
from salmon_tpu.mapping.lookup import hash_lookup
from salmon_tpu.mapping.pair import (MS_LEFT_ORPHAN, MS_PAIRED,
                                     MS_RIGHT_ORPHAN, join_pairs,
                                     merge_paired_with_orphans, orphan_hits)
from salmon_tpu.mapping.score import (candidate_read_start,
                                      diag_bucket_bits_for,
                                      expand_occurrences, score_candidates)

INVALID_TXP = jnp.int32(0x7FFFFFFF)


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    """Static (compile-time) shape and policy configuration."""
    k: int
    n_slots: int
    max_probes: int
    first_decoy_index: int
    num_txps: int
    max_tpos: int = 1 << 20       # max transcript length (diag-bucket sizing)
    occ_cap: int = DEFAULTS.occ_cap
    max_cands: int = DEFAULTS.max_cands
    max_pair_cands: int = DEFAULTS.max_pair_cands
    max_occs_per_hit: int = DEFAULTS.max_occs_per_hit
    fld_max: int = DEFAULTS.max_frag_length
    consensus_fraction: float = 1.0 - DEFAULTS.consensus_slack
    score_exp: float = DEFAULTS.score_exp
    decoy_threshold: float = DEFAULTS.decoy_threshold
    min_aln_prob: float = DEFAULTS.min_aln_prob
    hard_filter: bool = DEFAULTS.hard_filter
    incompat_prior: float = DEFAULTS.incompat_prior
    allow_dovetail: bool = DEFAULTS.allow_dovetail
    discard_orphans: bool = DEFAULTS.discard_orphans
    range_bins: int = DEFAULTS.range_factorization_bins
    # coverage score -> pseudo-alignment-score scale (match bonus per base;
    # reference ksw2 ma=2, SalmonDefaults.hpp:32)
    match_score: int = DEFAULTS.match_score
    kmer_stride: int = DEFAULTS.kmer_stride
    # selective-alignment DP validation (reference validateMappings;
    # scores every surviving candidate with banded affine DP and filters
    # on minScoreFraction)
    validate_mappings: bool = DEFAULTS.validate_mappings
    min_score_fraction: float = DEFAULTS.min_score_fraction
    # average DP problems budgeted per fragment (batch-global compaction)
    dp_budget: int = DEFAULTS.dp_budget
    mismatch_penalty: int = DEFAULTS.mismatch_penalty
    gap_open_penalty: int = DEFAULTS.gap_open_penalty
    gap_extend_penalty: int = DEFAULTS.gap_extend_penalty
    dp_bandwidth: int = DEFAULTS.dp_bandwidth
    # orphan rescue (reference recoverOrphans, opt-in)
    recover_orphans: bool = DEFAULTS.recover_orphans
    max_recover_read_occ: int = DEFAULTS.max_recover_read_occ
    rescue_bandwidth: int = DEFAULTS.rescue_bandwidth
    # FLD-quantile positions probed per orphan (1 = mean only; the
    # reference's edlib search covers the whole window,
    # SalmonQuantify.cpp:1356-1364 — quantile probes close the recall
    # gap for wide/shifted FLDs at fixed DP budget)
    rescue_probes: int = DEFAULTS.rescue_probes
    # single-end/orphan ambiguous fragment-length model (reference
    # LogCMFCache, DistributionUtils.hpp:84 / SalmonQuantify.cpp:640-650)
    model_single_frag_prob: bool = not DEFAULTS.no_single_frag_prob
    no_frag_length_dist: bool = DEFAULTS.no_frag_length_dist
    # DP end policies (reference aconf.allowSoftclip /
    # allowOverhangSoftclip, SalmonMappingUtils.hpp:194-195)
    softclip: bool = DEFAULTS.softclip
    softclip_overhangs: bool = DEFAULTS.softclip_overhangs
    # --writeOrphanLinks side output (SalmonQuantify.cpp:1409-1421)
    write_orphan_links: bool = DEFAULTS.write_orphan_links
    # alignment-cache DP shortcut (reference useAlignmentCache)
    alignment_cache: bool = DEFAULTS.alignment_cache
    # hits carried into weighting/eq emission (score-sorted truncation;
    # plays the maxReadOccs role for the aux/eq stages)
    weight_width: int = DEFAULTS.weight_width
    # batch-global sparse seed flow (mapping.seed_sparse) vs the dense
    # (R, P, C) expansion + per-row sorts
    sparse_seed: bool = DEFAULTS.sparse_seed
    # CSR is oct-aligned (index.diskfmt.oct_align_csr): ordinary windows
    # never spill past row0, so the expand tail pool only serves
    # shadow-merged blocks and can shrink ~8x with zero saturation risk
    occ_aligned: bool = False
    # table slots carry inlined single-occurrence records
    # (index.hashtable build_hash_table inline_records): the dense
    # expand pools the row0 gather over non-inline windows only
    inline_singles: bool = False
    seed_hits_per_end: int = DEFAULTS.seed_hits_per_end

    @staticmethod
    def from_index(idx: TranscriptomeIndex, opts: SalmonDefaults = DEFAULTS,
                   allow_no_table: bool = False,
                   **overrides) -> "MapperConfig":
        if idx.table is None and not allow_no_table:
            raise ValueError(
                "this index has no monolithic hash table (built at "
                "genome-decoy scale); quantify with --indexShards N")
        cfg = dict(
            k=idx.k,
            n_slots=idx.table.n_slots if idx.table is not None else 0,
            max_probes=(idx.table.max_probes if idx.table is not None
                        else 16),
            first_decoy_index=idx.first_decoy_index,
            num_txps=idx.num_targets,
            max_tpos=int(np.asarray(idx.lengths).max())
            if idx.num_targets else 1,
            occ_cap=opts.occ_cap, max_cands=opts.max_cands,
            max_pair_cands=opts.max_pair_cands,
            max_occs_per_hit=opts.max_occs_per_hit,
            fld_max=opts.max_frag_length,
            consensus_fraction=1.0 - opts.consensus_slack,
            score_exp=opts.score_exp,
            decoy_threshold=opts.decoy_threshold,
            min_aln_prob=opts.min_aln_prob,
            hard_filter=opts.hard_filter,
            incompat_prior=opts.incompat_prior,
            allow_dovetail=opts.allow_dovetail,
            discard_orphans=opts.discard_orphans,
            range_bins=opts.range_factorization_bins,
            match_score=opts.match_score,
            kmer_stride=opts.kmer_stride,
            validate_mappings=opts.validate_mappings,
            min_score_fraction=opts.min_score_fraction,
            dp_budget=opts.dp_budget,
            mismatch_penalty=opts.mismatch_penalty,
            gap_open_penalty=opts.gap_open_penalty,
            gap_extend_penalty=opts.gap_extend_penalty,
            dp_bandwidth=opts.dp_bandwidth,
            recover_orphans=opts.recover_orphans,
            max_recover_read_occ=getattr(opts, "max_recover_read_occ",
                                         2500),
            rescue_bandwidth=opts.rescue_bandwidth,
            rescue_probes=getattr(opts, "rescue_probes", 3),
            model_single_frag_prob=not opts.no_single_frag_prob,
            no_frag_length_dist=opts.no_frag_length_dist,
            softclip=opts.softclip,
            softclip_overhangs=opts.softclip_overhangs,
            write_orphan_links=opts.write_orphan_links,
            alignment_cache=opts.alignment_cache,
            weight_width=opts.weight_width,
            sparse_seed=(os.environ["SALMON_TPU_SPARSE_SEED"] == "1"
                         if os.environ.get("SALMON_TPU_SPARSE_SEED")
                         else opts.sparse_seed),
            seed_hits_per_end=opts.seed_hits_per_end,
            occ_aligned=bool(idx.info.get("occ_oct_aligned", False)),
            inline_singles=bool(idx.info.get("table_inline_singles",
                                             False)),
        )
        cfg.update(overrides)
        kept = int(idx.info.get("max_occs_kept", 0) or 0)
        if kept and cfg["occ_cap"] > kept:
            # pruned CSR (--maxOccsKept): gathering past a key's kept
            # records would read the NEXT key's records — clamp
            logger.warning(
                "occ_cap %d exceeds the index's maxOccsKept %d; "
                "clamping (rebuild the index with a larger "
                "--maxOccsKept to raise it)", cfg["occ_cap"], kept)
            cfg["occ_cap"] = kept
        return MapperConfig(**cfg)


def device_index_arrays(idx: TranscriptomeIndex) -> dict:
    """Materialize the index as a dict of device-transferable arrays.

    Tables are packed row matrices so device probes are single row
    gathers (see index.hashtable docstring for why this is load-bearing
    on TPU). Offsets promote to int64 past 2^31 concatenated bases
    (decoy-aware genome-scale indexes), and the raw byte-per-base codes
    are not shipped at that scale — the DP reads the 4-bit packed seq4
    planes (half the HBM)."""
    n_occ = idx.occ_txp.shape[0]
    # oct rows: 8 records of [txp, pos<<1|fwd] per 16-wide row —
    # row-gather cost is per ROW, so a C-occurrence fetch reads
    # ceil((C+7)/8) rows instead of C (see mapping.score.gather_occ_oct).
    # The width is fixed HOST-side: reshaping the multi-GB table on
    # device makes XLA materialize a (8,128)-tiled relayout copy (16x
    # HBM — OOMs at human scale)
    n_oct = max((n_occ + 7) // 8, 1)
    occ_oct = np.zeros((n_oct * 8, 2), dtype=np.int32)
    occ_oct[:n_occ, 0] = idx.occ_txp
    occ_oct[:n_occ, 1] = idx.occ_pf
    occ_oct = occ_oct.reshape(n_oct, 16)
    total = int(idx.seq_offsets[-1])
    off_dtype = np.int64 if total + _SEQ4_SHIFT + 256 >= 2**31 \
        else np.int32
    big = total >= 2**28
    # the bucket table ships as ONE (n_buckets, 8) matrix of 4-slot
    # interleaved rows: a 32-byte row is the efficient gather granule
    # and a query is two row gathers — see mapping.lookup.hash_lookup
    return {
        "tab_rows": jnp.asarray(idx.table.rows),
        "occ_oct": jnp.asarray(occ_oct),
        "txp_lens": jnp.asarray(idx.lengths.astype(np.int32)),
        "seq_codes": jnp.asarray(idx.seq_codes if not big
                                 else np.zeros(1, np.uint8)),
        "seq_off": jnp.asarray(idx.seq_offsets.astype(off_dtype)),
        "seq4": jnp.asarray(_seq4_words(idx)),
    }


# lead pad before the packed sequence: absorbs ref_base going negative
# by up to (max read length + bandwidth) — flip-based rc problems shift
# ref_base down by up to L (reads bucket up to 1024 bases)
_SEQ4_SHIFT = 1280


def _seq4_words(idx):
    # cached as an attribute on the index object itself (an id(idx)-keyed
    # dict can alias a stale entry after GC reuses the id)
    words = getattr(idx, "_seq4_words_cache", None)
    if words is None:
        from salmon_tpu.mapping.align import pack_seq4
        words, _ = pack_seq4(idx.seq_codes, lead_pad=_SEQ4_SHIFT)
        object.__setattr__(idx, "_seq4_words_cache", words)
    return words


def _end_seeds(codes, lengths, dev, cfg: MapperConfig):
    """Stages 1-2 for one read end: k-mer extraction + hash lookup."""
    km = extract_kmers(codes, lengths, cfg.k)
    if cfg.kmer_stride > 1:
        # seed-skip: query every stride-th window (reference analog:
        # altSkip, SalmonDefaults.hpp:37; streaming-query skip heuristics)
        km = {k: v[:, ::cfg.kmer_stride] for k, v in km.items()}
    lk = hash_lookup(km["hi"], km["lo"], dev["tab_rows"],
                     cfg.n_slots, cfg.max_probes)
    return km, lk


def _seed_candidates(ends, lengths_per_end, dev, cfg: MapperConfig):
    """Stages 1-3 for one or two read ends -> [(cand, start), ...]."""
    seeded = [_end_seeds(codes, lengths, dev, cfg)
              for codes, lengths in zip(ends, lengths_per_end)]
    if cfg.sparse_seed:
        from salmon_tpu.mapping.seed_sparse import seed_candidates_sparse
        P = seeded[0][1][0].shape[1]
        wb = max(8, int(np.ceil(np.log2(max(P, 2)))))
        cands = seed_candidates_sparse(
            seeded, dev["occ_oct"], occ_cap=cfg.occ_cap,
            max_occs_per_hit=cfg.max_occs_per_hit,
            hits_per_end=cfg.seed_hits_per_end,
            max_cands=cfg.max_cands, stride=cfg.kmer_stride,
            diag_bucket_bits=diag_bucket_bits_for(cfg.max_tpos, wb))
    else:
        cands = [_dense_candidates(km, lk, dev, cfg)
                 for km, lk in seeded]
    return [(cand, candidate_read_start(cand, lengths, cfg.k))
            for cand, lengths in zip(cands, lengths_per_end)]


def _dense_candidates(km, lk, dev, cfg: MapperConfig):
    """Dense (R, P, C) expansion + per-row sort scoring (legacy path)."""
    # inline_pool stays OFF: pooling the row0 gather over non-inline
    # windows (sort + K0 gather + un-sort) measured a wash at human
    # scale and a big loss at sample scale — the un-sort's 17-operand
    # lax.sort costs what the skipped gathers save. Inline decode still
    # applies (records come from the lookup), which is what lets a
    # compacted CSR drop single-occurrence records entirely.
    # per-row pooled row0 gather (expand_occurrences row_pool): only
    # meaningful when the table inlines single-occurrence records
    # (~75-80% of windows then skip the CSR); opt-in via env while the
    # win is being measured on hardware
    rp = int(os.environ.get("SALMON_TPU_ROWPOOL", "0") or 0)
    key, rpos, diag, ovalid, n_tail_over = expand_occurrences(
        km, lk, dev["occ_oct"],
        cfg.occ_cap, cfg.max_occs_per_hit, stride=cfg.kmer_stride,
        tail_frac=64 if (cfg.occ_aligned and cfg.occ_cap <= 8) else 8,
        inline_pool=False,
        row_pool=rp if cfg.inline_singles else 0)
    # expand emits (R, N = P*C) directly — (R, P, C) minor-dim-8
    # tensors pay a 16x lane-padding tax under the default TPU tiling
    n_windows = lk[0].shape[1]
    # window field must hold every window index (long reads overflow the
    # 8-bit default: P windows -> ceil(log2(P)) bits)
    window_bits = max(8, int(np.ceil(np.log2(max(n_windows, 2)))))
    # key2 = diag_bucket << window_bits | window must fit 32 bits:
    # diagonals (~transcript length) up to 2^(32-window_bits+5) - pad
    if window_bits > 12:
        raise ValueError(
            f"{n_windows} seed windows need window_bits={window_bits} "
            f"> 12, which would overflow the diagonal-bucket sort key; "
            f"raise kmer_stride or reduce max_read_len")
    cand = score_candidates(
        key, rpos, diag,
        cfg.max_cands, stride=cfg.kmer_stride, window_bits=window_bits,
        diag_bucket_bits=diag_bucket_bits_for(cfg.max_tpos, window_bits))
    # tail-budget saturation counter (see expand_occurrences docstring);
    # popped back out by map_*_from_cands into out["seed_tail_over"]
    cand["tail_over"] = n_tail_over
    return cand


def _device_revcomp(codes, lengths):
    """Per-read reverse complement respecting ragged lengths
    (left-aligned output; per-element take_along_axis — measured
    ~18 ms per (16k, 100) call on this backend, so the DP path uses
    `_revcomp_flip` instead; kept for side outputs)."""
    R, L = codes.shape
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    src = lengths[:, None] - 1 - j
    ok = src >= 0
    g = jnp.take_along_axis(codes, jnp.clip(src, 0, L - 1).astype(
        jnp.int32), axis=1)
    return jnp.where(ok & (g < 4), 3 - g, 4).astype(codes.dtype)


def _revcomp_flip(codes):
    """Reverse complement as a pure mirror: row content lands at columns
    [L - len, L) instead of [0, len) — a layout + elementwise op with
    no gathers. The DP consumes it with read_starts = L - len (content
    rows frozen outside the window), so no re-alignment gather is ever
    needed."""
    flipped = codes[:, ::-1]
    return jnp.where(flipped < 4, 3 - flipped, 4).astype(codes.dtype)


def _dp_scores(joined: dict, batch: dict, dev: dict, cfg: MapperConfig,
               single_end: bool):
    """Selective-alignment validation: banded affine DP score for every
    joined candidate (reference PuffAligner calculateAlignments,
    SalmonQuantify.cpp:1523-1525). Returns (score, perfect) of (R, T2)."""
    from salmon_tpu.mapping.align import banded_scores_indexed

    if single_end:
        codes_l, len_l = batch["codes"], batch["lengths"]
        codes_r, len_r = codes_l, len_l
    else:
        codes_l, len_l = batch["codes_l"], batch["lengths_l"]
        codes_r, len_r = batch["codes_r"], batch["lengths_r"]
    R, L = codes_l.shape
    T2 = joined["txp"].shape[1]
    # read variants: 0=l fw, 1=l rc, 2=r fw, 3=r rc (rc variants are
    # flip-based: content at rows [L-len, L), declared via read_starts)
    reads_all = jnp.concatenate(
        [codes_l, _revcomp_flip(codes_l),
         codes_r, _revcomp_flip(codes_r)], axis=0)

    txp = joined["txp"]
    fw1 = joined["fw"]
    ms = joined["mate_status"]
    pos = joined["pos"]
    frag_end = pos + joined["frag_len"] - 1
    rows = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None],
                            (R, T2))
    l1 = len_l[:, None]
    l2 = len_r[:, None]

    is_right_orphan = (ms == MS_RIGHT_ORPHAN)[:, None]
    is_paired = (ms == MS_PAIRED)[:, None] & ~jnp.bool_(single_end)

    m1_var = jnp.where(is_right_orphan,
                       jnp.where(fw1, 2, 3), jnp.where(fw1, 0, 1))
    m1_pos = jnp.where(is_paired,
                       jnp.where(fw1, pos, frag_end - l1 + 1), pos)
    m1_len = jnp.broadcast_to(jnp.where(is_right_orphan, l2, l1), (R, T2))
    m2_var = jnp.broadcast_to(jnp.where(fw1, 3, 2), (R, T2))
    m2_pos = jnp.where(fw1, frag_end - l2 + 1, pos)
    m2_len = jnp.broadcast_to(l2, (R, T2))

    flat = lambda a: a.reshape(-1)

    # --- alignment-cache shortcut (reference useAlignmentCache /
    # !disableAlignmentCache, SalmonMappingUtils.hpp:196): a candidate
    # whose chain covers EVERY seed window of both mapped mates is a
    # (near-)exact match — assign the perfect score without DP. With
    # chaining on, the chain score counts distinct co-linear windows,
    # so full coverage implies no seed-breaking edits.
    def n_windows(ln):
        return jnp.maximum((ln - cfg.k) // cfg.kmer_stride + 1, 0)

    if single_end:
        full_thresh = n_windows(len_l)[:, None]
    else:
        nw1 = n_windows(len_l)[:, None]
        nw2 = n_windows(len_r)[:, None]
        full_thresh = jnp.where(
            is_paired, nw1 + nw2,
            jnp.where(is_right_orphan, nw2, nw1))
    full_cov = (joined["valid"]
                & (joined["score"] >= full_thresh)) \
        if cfg.alignment_cache else jnp.zeros_like(joined["valid"])

    # --- batch-global compaction: most of the T2 slots are padding (and
    # full-coverage hits skip DP entirely); DP only the K highest-
    # priority remaining candidates (K = R * dp_budget; halved when the
    # alignment cache absorbs the perfect majority). The priority rides
    # a SINGLE packed u32 sort key (need-dp bit + slot index).
    budget = (max(2, cfg.dp_budget // 2) if cfg.alignment_cache
              else cfg.dp_budget)
    K = R * budget
    valid_f = flat(joined["valid"])
    need_dp = valid_f & ~flat(full_cov)
    # per-READ cap (not a shared batch pool): each read keeps its first
    # `budget` needy slots (slots are already chain-score-ranked), so a
    # read's validated set never depends on the rest of the batch — the
    # sharded path stays bit-identical to single-device at any split
    need_2d = need_dp.reshape(R, T2)
    keep = need_dp & flat(jnp.cumsum(need_2d.astype(jnp.int32),
                                     axis=1) <= budget)
    idx_bits = max(1, (R * T2 - 1).bit_length())
    packed = (jnp.where(keep, jnp.uint32(0), jnp.uint32(1))
              << jnp.uint32(idx_bits)) | jnp.arange(
        R * T2, dtype=jnp.uint32)
    sel = (jax.lax.sort(packed, dimension=0, is_stable=False)[:K]
           & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    sel_valid = jnp.take(keep, sel)

    # per-slot DP parameters as packed rows -> ONE row gather per mate
    # (element gathers cost ~8ns/row on this backend; 4-8-wide rows ~3ns).
    # Row layout: [variant, ref_base - lo, len, lo, txp] where
    # lo = L - len for rc (flip-based) variants, 0 otherwise.
    def mate_rows(var, p, ln):
        lo = jnp.where((var & 1) == 1, L - ln, 0)
        return jnp.stack(
            [jnp.broadcast_to(var, (R, T2)).reshape(-1),
             jnp.broadcast_to(p - lo, (R, T2)).reshape(-1),
             jnp.broadcast_to(ln, (R, T2)).reshape(-1),
             jnp.broadcast_to(lo, (R, T2)).reshape(-1),
             flat(txp)], axis=1)

    rows_f = flat(rows)
    sel_read = jnp.take(rows_f, sel)

    def run(params, params2=None):
        # both mates ride ONE kernel call (concatenated problems): the
        # fixed costs — window fetch chain, i8 transposes, skew build,
        # dispatch — amortize across 2K problems instead of paying twice
        pr = jnp.take(params, sel, axis=0)      # (K, 5) row gather
        reps = 1
        if params2 is not None:
            pr = jnp.concatenate(
                [pr, jnp.take(params2, sel, axis=0)], axis=0)
            reps = 2
        var, p, ln, lo, t_sel = (pr[:, 0], pr[:, 1], pr[:, 2],
                                 pr[:, 3], pr[:, 4])
        toff = jnp.take(dev["seq_off"], jnp.clip(t_sel, 0, None),
                        mode="clip")
        tlen = jnp.take(dev["txp_lens"], t_sel, mode="clip")
        ids = jnp.tile(sel_read, reps) + var * R
        scores = banded_scores_indexed(
            reads_all, ids, ln, p, tlen, dev["seq_codes"], toff,
            cfg.dp_bandwidth, float(cfg.match_score),
            float(cfg.mismatch_penalty), float(cfg.gap_open_penalty),
            float(cfg.gap_extend_penalty),
            seq_words=dev.get("seq4"), seq_words_shift=_SEQ4_SHIFT,
            softclip=cfg.softclip,
            softclip_overhangs=cfg.softclip_overhangs,
            read_starts=lo)
        return jnp.where(jnp.tile(sel_valid, reps), scores,
                         jnp.float32(-1e9))

    if single_end:
        perfect = (cfg.match_score * m1_len).astype(jnp.float32)
    else:
        perfect = jnp.where(
            is_paired, cfg.match_score * (l1 + l2),
            cfg.match_score * m1_len).astype(jnp.float32)
    perfect = jnp.broadcast_to(perfect, (R, T2))

    # DP'd slots get their computed scores scattered in; full-coverage
    # slots are overridden with the perfect score at the end
    NEGS = jnp.full(R * T2, -1e9, jnp.float32)
    if single_end:
        s1 = NEGS.at[sel].set(
            run(mate_rows(m1_var, m1_pos, m1_len))).reshape(R, T2)
        score = jnp.where(full_cov, perfect, s1)
        return score, perfect
    K_sel = sel.shape[0]
    both = run(mate_rows(m1_var, m1_pos, m1_len),
               mate_rows(m2_var, m2_pos, m2_len))
    s1 = NEGS.at[sel].set(both[:K_sel]).reshape(R, T2)
    s2 = NEGS.at[sel].set(both[K_sel:]).reshape(R, T2)
    score = jnp.where(is_paired, s1 + s2, s1)
    score = jnp.where(full_cov, perfect, score)
    return score, perfect


def _rescue_orphans(joined: dict, batch: dict, dev: dict,
                    cfg: MapperConfig, fld_logpmf, aln_score,
                    perfect_score):
    """Orphan rescue (reference recoverOrphans ->
    selective_alignment::utils::recoverOrphans, consumed at
    SalmonQuantify.cpp:1356-1364, edlib-based).

    For each orphan fragment's best candidate, the missing mate is
    DP-aligned at FLD-quantile-predicted positions (rescue_probes of
    them, median first) with a widened band (rescue_bandwidth), vs the
    reference's full-window edlib search — narrower but kernel-reusing.
    Measured recall vs an oracle-position probe is within a few points
    even for sigma=160 FLDs (scripts/sim_rescue_recall.py). On success
    the fragment is upgraded to paired with the rescue score folded
    in. (orphan, probe) pairs are batch-globally compacted into R/4 DP
    slots, every orphan's median probe taking priority over any
    orphan's second probe.
    """
    from salmon_tpu.mapping.align import banded_scores_indexed

    codes_l, len_l = batch["codes_l"], batch["lengths_l"]
    codes_r, len_r = batch["codes_r"], batch["lengths_r"]
    R, L = codes_l.shape
    reads_all = jnp.concatenate(
        [codes_l, _revcomp_flip(codes_l),
         codes_r, _revcomp_flip(codes_r)], axis=0)

    ms = joined["mate_status"]
    is_orph = ms != MS_PAIRED
    txp0 = joined["txp"][:, 0]
    pos0 = joined["pos"][:, 0]
    fw0 = joined["fw"][:, 0]
    cand_ok = joined["valid"][:, 0] & is_orph
    # reference gate: skip rescue for reads mapping more than
    # maxRecoverReadOcc times (ProgramOptionsGenerator.cpp:493-497)
    n_occ = jnp.sum(joined["valid"].astype(jnp.int32), axis=1)
    cand_ok = cand_ok & (n_occ <= cfg.max_recover_read_occ)

    # predicted fragment lengths: FLD mean (Q=1) or FLD quantiles — a
    # wide or shifted learned FLD puts much of its mass outside one
    # band around the mean; quantile probes cover it at the same total
    # DP budget (reference edlib searches the whole window). Probe 0
    # is always the median (closest to the old mean behavior).
    Q = max(1, int(cfg.rescue_probes))
    pmf = jnp.exp(fld_logpmf)
    if Q == 1:
        mean_fl = jnp.sum(pmf * jnp.arange(fld_logpmf.shape[0],
                                           dtype=jnp.float32))
        fl_probes = [jnp.round(mean_fl).astype(jnp.int32)]
    else:
        cdf = jnp.cumsum(pmf)
        # median first, then outer quantiles by distance from 0.5
        qs = sorted([(i + 0.5) / Q for i in range(Q)],
                    key=lambda q: abs(q - 0.5))
        fl_probes = [jnp.searchsorted(
            cdf, q * cdf[-1]).astype(jnp.int32) for q in qs]

    left_orph = ms == MS_LEFT_ORPHAN
    miss_len = jnp.where(left_orph, len_r, len_l)
    mapped_len = jnp.where(left_orph, len_l, len_r)
    # missing-mate read variant (0=l fw,1=l rc,2=r fw,3=r rc): inward
    # pairing means the missing mate has the opposite orientation
    var = jnp.where(left_orph, jnp.where(fw0, 3, 2),
                    jnp.where(fw0, 1, 0))
    mate_left_q = [jnp.where(fw0, pos0 + fl - miss_len,
                             pos0 + mapped_len - fl)
                   for fl in fl_probes]

    # compact (orphan, probe) pairs into K = R/4 DP slots (the same
    # total budget as the single-probe version). Priority fills probe 0
    # (the median) for EVERY orphan before any orphan gets a second
    # probe: few orphans → each gets all Q quantiles; many orphans →
    # each still gets the median, like the old behavior.
    K = max(1, R // 4)
    orph_idx = jnp.tile(jnp.arange(R, dtype=jnp.int32), Q)   # (Q*R,)
    q_idx = jnp.repeat(jnp.arange(Q, dtype=jnp.int32), R)
    cand_tile = jnp.tile(cand_ok, Q)
    prio = jnp.where(cand_tile,
                     (q_idx * R + orph_idx).astype(jnp.uint32),
                     jnp.uint32(0xFFFFFFFF))
    sel_flat = jnp.argsort(prio)[:K]
    sel = jnp.take(orph_idx, sel_flat)                       # orphan row
    s_ok = jnp.take(cand_tile, sel_flat)
    s_txp = jnp.take(txp0, sel)
    toff = jnp.take(dev["seq_off"], jnp.clip(s_txp, 0, None), mode="clip")
    tlen = jnp.take(dev["txp_lens"], s_txp, mode="clip")
    s_var = jnp.take(var, sel)
    s_len = jnp.take(miss_len, sel)
    # flip-based rc variants (odd ids) have content at rows [L-len, L)
    s_lo = jnp.where((s_var & 1) == 1, L - s_len, 0)
    ids = sel + s_var * R
    ml_flat = jnp.take(jnp.concatenate(mate_left_q), sel_flat)  # (K,)
    scores = banded_scores_indexed(
        reads_all, ids, s_len, ml_flat - s_lo, tlen,
        dev["seq_codes"], toff, cfg.rescue_bandwidth,
        float(cfg.match_score), float(cfg.mismatch_penalty),
        float(cfg.gap_open_penalty), float(cfg.gap_extend_penalty),
        seq_words=dev.get("seq4"), seq_words_shift=_SEQ4_SHIFT,
        softclip=cfg.softclip,
        softclip_overhangs=cfg.softclip_overhangs,
        read_starts=s_lo)
    good = s_ok & (scores >= cfg.min_score_fraction
                   * cfg.match_score
                   * jnp.take(miss_len, sel).astype(jnp.float32))
    # per-orphan reduction over its probes: best score wins; the
    # winning probe's predicted mate position feeds the upgraded pair
    resc = jnp.zeros(R, bool).at[sel].max(good)
    resc_score = jnp.zeros(R, jnp.float32).at[sel].max(
        jnp.where(good, scores, 0.0))
    is_win = good & (scores >= jnp.take(resc_score, sel))
    mate_left = jnp.full(R, jnp.iinfo(jnp.int32).min, jnp.int32).at[
        sel].max(jnp.where(is_win, ml_flat,
                           jnp.iinfo(jnp.int32).min))
    mate_left = jnp.where(resc, mate_left, 0)

    # upgrade fragment state (column 0 carries the rescued pair)
    from salmon_tpu.mapping.pair import observed_paired_code
    s1 = pos0
    s2 = mate_left
    obs_new = observed_paired_code(s1, fw0, s2, ~fw0)
    new_flen = jnp.abs(jnp.maximum(s1 + jnp.where(left_orph, len_l,
                                                  len_r),
                                   s2 + miss_len)
                       - jnp.minimum(s1, s2))

    joined = dict(joined)
    joined["mate_status"] = jnp.where(resc, MS_PAIRED, ms)
    joined["frag_len"] = jnp.where(
        resc[:, None],
        jnp.broadcast_to(new_flen[:, None], joined["frag_len"].shape),
        joined["frag_len"])
    joined["obs_code"] = joined["obs_code"].at[:, 0].set(
        jnp.where(resc, obs_new, joined["obs_code"][:, 0]))
    joined["pos"] = joined["pos"].at[:, 0].set(
        jnp.where(resc, jnp.minimum(s1, s2), joined["pos"][:, 0]))
    if aln_score is not None:
        aln_score = aln_score.at[:, 0].add(
            jnp.where(resc, resc_score, 0.0))
        perfect_score = jnp.where(
            resc[:, None],
            (cfg.match_score * (len_l + len_r)[:, None]).astype(
                jnp.float32),
            perfect_score)
    n_rescued = jnp.sum(resc.astype(jnp.int32))
    return joined, aln_score, perfect_score, n_rescued


LOG_EPSILON = -87.33654475055311  # SalmonMath.hpp LOG_EPSILON


def _fld_inputs(fld):
    """Normalize the fld argument: either a bare (M+1,) log-pmf (legacy;
    log-CMF derived in-graph, mode=1) or a dict with keys
    logpmf/logcmf/mode. mode: 0 = ignore FLD (pre-pre-burn-in), 1 =
    unconditional pmf, 2 = pmf conditioned on transcript length
    (burned-in; reference SalmonQuantify.cpp:661-668)."""
    if isinstance(fld, dict):
        return fld["logpmf"], fld["logcmf"], fld["mode"]
    logcmf = jnp.log(jnp.maximum(jnp.cumsum(jnp.exp(fld)), 1e-30))
    return fld, logcmf, jnp.int32(1)


def _filter_and_weight(joined: dict, fld, compat_paired,
                       compat_orphan, lengths_sum, cfg: MapperConfig,
                       aln_score=None, perfect_score=None,
                       tlen=None, rlen_mapped=None, single_end=False):
    """Stages 5-6: decoy-aware filtering and aux-probability weights.

    joined: dict of (R, T2) from pair-merging, plus (R,) mate_status.
    fld: see _fld_inputs.
    compat_paired: (6,) bool table; compat_orphan: (2, 2) bool table.
    tlen: (R, T2) transcript length per candidate; rlen_mapped: (R,)
    length of the mapped read (for the orphan/single-end virtual mate).
    Returns (eq_txp, eq_weight, frag_ok, aln_valid, extras...).
    """
    txp = joined["txp"]
    score = joined["score"]
    valid = joined["valid"]
    valid_pre = valid
    ms = joined["mate_status"]

    is_decoy = valid & (txp >= cfg.first_decoy_index)
    real = valid & ~is_decoy

    if aln_score is not None:
        # DP-validated score + minScoreFraction gate (reference
        # filterAndCollectAlignments, SalmonMappingUtils.hpp:283-405)
        s = aln_score
        valid = valid & (s >= cfg.min_score_fraction * perfect_score)
        is_decoy = valid & (txp >= cfg.first_decoy_index)
        real = valid & ~is_decoy
    else:
        # coverage score scaled by per-base match bonus (the reference's
        # tryAlign=false path, SalmonMappingUtils.hpp:359-361)
        s = score.astype(jnp.float32) * float(cfg.match_score)
    NEG = jnp.float32(-1e30)
    best_real = jnp.max(jnp.where(real, s, NEG), axis=1, keepdims=True)
    best_decoy = jnp.max(jnp.where(is_decoy, s, NEG), axis=1, keepdims=True)

    # decoy soft filter (SalmonMappingUtils.hpp filterAndCollectAlignments):
    # keep real hits with score >= decoyThreshold * bestDecoyScore
    decoy_thresh = jnp.where(best_decoy > NEG / 2,
                             cfg.decoy_threshold * best_decoy, NEG)
    keep = real & (s >= decoy_thresh)

    # estAlnProb = exp(-scoreExp * (best - score)); drop < minAlnProb
    aln_logprob = -cfg.score_exp * (best_real - s)
    keep = keep & (aln_logprob >= jnp.log(cfg.min_aln_prob))
    if cfg.hard_filter:
        keep = keep & (s >= best_real)

    # consensus fraction on coverage scores (pre-DP hit filter analog)
    keep = keep & (score.astype(jnp.float32)
                   >= cfg.consensus_fraction
                   * jnp.max(jnp.where(real, score, 0), axis=1,
                             keepdims=True).astype(jnp.float32))

    # --- aux probabilities (processMiniBatch, SalmonQuantify.cpp:599-803)
    logpmf, logcmf, fld_mode = _fld_inputs(fld)
    # [logpmf, logcmf] as 2-wide rows: one ROW gather per lookup index
    # (element gathers cost ~8ns apiece on this backend, 2-wide row
    # gathers ~3ns)
    fld_tab = jnp.stack([logpmf, logcmf], axis=1)
    M = cfg.fld_max
    flen = jnp.clip(joined["frag_len"], 0, M)
    is_pair_row = (ms[:, None] == MS_PAIRED) & ~jnp.bool_(single_end)
    if cfg.no_frag_length_dist:
        # --noFragLengthDist: pairs get LOG_1; unexpected orphans a
        # fixed eps penalty (SalmonQuantify.cpp:651-655)
        log_flen_prob = jnp.where(is_pair_row | jnp.bool_(single_end),
                                  0.0, LOG_EPSILON)
    elif tlen is None:
        lenprob = jnp.take(fld_tab, flen, axis=0, mode="clip")[..., 0]
        log_flen_prob = jnp.where(is_pair_row, lenprob, 0.0)
    else:
        tl = jnp.maximum(tlen, 0)
        logcmf_t = jnp.take(fld_tab, jnp.minimum(tl, M), axis=0,
                            mode="clip")[..., 1]
        cmf_ok = logcmf_t > LOG_EPSILON  # CMF(tlen) has mass
        # paired rows read pmf[frag_len]; orphan/single rows read
        # cmf[max ambiguous length] — ONE merged row gather serves both
        # (a row gather costs the same whichever row it fetches)
        if cfg.model_single_frag_prob:
            # ambiguous-length prob for single-end / unexpected-orphan
            # hits (LogCMFCache::getAmbigFragLengthProb,
            # DistributionUtils.cpp:151-172): mass of fragments no
            # longer than the room left in the virtual mate's direction
            pos = joined["pos"]
            rl = rlen_mapped[:, None]
            maxfl = jnp.where(joined["fw"], tl - jnp.clip(pos, 0, tl),
                              jnp.clip(pos + rl, 0, tl))
            idx_main = jnp.where(is_pair_row, flen,
                                 jnp.clip(maxfl, 0, M))
        else:
            idx_main = flen
        main = jnp.take(fld_tab, idx_main, axis=0, mode="clip")
        lenprob = main[..., 0]
        # paired pmf, conditioned on txp length once burned in
        # (reference SalmonQuantify.cpp:661-668)
        cond_ok = cmf_ok & (joined["frag_len"] < tl)
        paired_prob = jnp.where(
            fld_mode >= 2,
            jnp.where(cond_ok, lenprob - logcmf_t, LOG_EPSILON),
            jnp.where(fld_mode == 1, lenprob, 0.0))
        if cfg.model_single_frag_prob:
            ambig = jnp.where(cmf_ok, main[..., 1] - logcmf_t,
                              LOG_EPSILON)
        else:
            ambig = jnp.where(jnp.bool_(single_end), 0.0, LOG_EPSILON)
        log_flen_prob = jnp.where(is_pair_row, paired_prob, ambig)

    # library-format compatibility via branchless selects — the tables
    # are 6- and 4-entry, so arithmetic beats per-element gathers
    obs = joined["obs_code"]
    paired_compat = jnp.zeros(obs.shape, bool)
    for _i in range(6):
        paired_compat = paired_compat | ((obs == _i) & compat_paired[_i])
    orph_left = (ms == MS_LEFT_ORPHAN)[:, None]
    fwc = joined["fw"]
    orph_compat = (
        (orph_left & fwc & compat_orphan[0, 0])
        | (orph_left & ~fwc & compat_orphan[0, 1])
        | (~orph_left & fwc & compat_orphan[1, 0])
        | (~orph_left & ~fwc & compat_orphan[1, 1]))
    compat = jnp.where(ms[:, None] == MS_PAIRED, paired_compat, orph_compat)
    log_compat = jnp.where(
        compat, 0.0,
        jnp.log(cfg.incompat_prior) if cfg.incompat_prior > 0 else NEG)

    logw = aln_logprob + log_flen_prob + log_compat
    keep = keep & (logw > NEG / 2)
    # re-normalize per fragment for numerical sanity
    logw_max = jnp.max(jnp.where(keep, logw, NEG), axis=1, keepdims=True)
    w = jnp.where(keep, jnp.exp(logw - jnp.where(logw_max > NEG / 2,
                                                 logw_max, 0.0)), 0.0)

    # --- collapse per-transcript (sum weights of multi-hits to same txp);
    # frag_len/pos are consumed pre-sort, so the sorts carry only (key, w)
    txp_key = jnp.where(keep, txp, INVALID_TXP)
    txp_s, w_s = jax.lax.sort(
        (txp_key, w), dimension=1, num_keys=1, is_stable=False)
    R, T2 = txp_s.shape
    prev = jnp.concatenate(
        [jnp.full((R, 1), -1, jnp.int32), txp_s[:, :-1]], axis=1)
    nxt = jnp.concatenate(
        [txp_s[:, 1:], jnp.full((R, 1), INVALID_TXP)], axis=1)
    v = txp_s != INVALID_TXP
    rs = v & (txp_s != prev)
    re = v & (txp_s != nxt)
    from salmon_tpu.mapping.score import segment_carry_first
    cw = jnp.cumsum(w_s, axis=1)
    cw_start = segment_carry_first(cw, rs)
    w_start = segment_carry_first(w_s, rs)
    run_w = cw - cw_start + w_start  # summed weight over the run, at end

    eq_txp = jnp.where(re, txp_s, INVALID_TXP)
    eq_w = jnp.where(re, run_w, 0.0)
    # compact labels to the left, ascending txp (re-sort by masked txp)
    eq_txp, eq_w = jax.lax.sort(
        (eq_txp, eq_w), dimension=1, num_keys=1, is_stable=False)
    aln_valid = eq_txp != INVALID_TXP
    frag_ok = aln_valid.any(axis=1)

    # normalized per-fragment posteriors + range-factorization bins
    # (reference: SalmonQuantify.cpp:845-853 — bin = floor(auxProb *
    # (sqrt(groupSize) + B)), appended to the class label)
    wsum = jnp.sum(eq_w, axis=1, keepdims=True)
    wn = jnp.where(wsum > 0, eq_w / jnp.maximum(wsum, 1e-30), 0.0)
    n_valid = jnp.sum(aln_valid, axis=1, keepdims=True).astype(jnp.float32)
    range_count = jnp.sqrt(n_valid) + float(cfg.range_bins)
    eq_bins = jnp.where(aln_valid & (cfg.range_bins > 0),
                        (wn * range_count).astype(jnp.int32), -1)
    # mapping statistics (reference MappingStatistics /
    # SalmonQuantify.cpp counters): fragments whose best hit is a decoy;
    # alignments that failed the validation threshold; fragments with
    # pre-validation hits but none surviving
    extras = {
        "decoy_frag": is_decoy.any(axis=1)
        & (best_decoy > jnp.maximum(best_real, NEG / 2))[:, 0],
        "below_thresh": jnp.sum(
            (valid_pre & ~valid & (txp < cfg.first_decoy_index))
            .astype(jnp.int32), axis=1),
        "had_pre": valid_pre.any(axis=1),
    }
    return eq_txp, eq_w, frag_ok, aln_valid, wn, eq_bins, extras


def map_paired_batch_impl(batch: dict, dev: dict, cfg: MapperConfig,
                          fld_logpmf=None, compat_paired=None,
                          compat_orphan=None):
    """Map one paired-end batch end-to-end.

    batch: dict with codes_l/lengths_l/codes_r/lengths_r.
    Returns dict with eq-class tensors, FLD histogram contribution and
    counters (all fixed-shape).
    """
    cands = _seed_candidates(
        [batch["codes_l"], batch["codes_r"]],
        [batch["lengths_l"], batch["lengths_r"]], dev, cfg)
    return map_paired_from_cands(cands, batch, dev, cfg, fld_logpmf,
                                 compat_paired, compat_orphan)


def map_paired_from_cands(cands, batch: dict, dev: dict,
                          cfg: MapperConfig, fld_logpmf=None,
                          compat_paired=None, compat_orphan=None):
    """Stages 4-6 of the paired pipeline, entered with seed candidates
    already scored — the sharded-index path (parallel.sharded) produces
    candidates from k-mer-sharded lookups and re-enters here."""
    (cand_l, start_l), (cand_r, start_r) = cands
    seed_tail_over = (cand_l.pop("tail_over", jnp.int32(0))
                      + cand_r.pop("tail_over", jnp.int32(0)))

    paired = join_pairs(cand_l, cand_r, start_l, start_r,
                        batch["lengths_l"], batch["lengths_r"],
                        cfg.max_pair_cands, cfg.fld_max,
                        cfg.allow_dovetail)
    orph_l = orphan_hits(cand_l, start_l, MS_LEFT_ORPHAN, cfg.max_pair_cands)
    orph_r = orphan_hits(cand_r, start_r, MS_RIGHT_ORPHAN,
                         cfg.max_pair_cands)
    joined = merge_paired_with_orphans(paired, orph_l, orph_r,
                                       cfg.discard_orphans)

    aln_score = perfect = None
    n_rescued = jnp.int32(0)
    if cfg.validate_mappings:
        aln_score, perfect = _dp_scores(joined, batch, dev, cfg,
                                        single_end=False)
        if cfg.recover_orphans:
            joined, aln_score, perfect, n_rescued = _rescue_orphans(
                joined, batch, dev, cfg, _fld_inputs(fld_logpmf)[0],
                aln_score, perfect)

    real_row = batch["lengths_l"] > 0  # padding rows never count
    # weighting/eq emission runs on the top weight_width score-sorted
    # hits only (candidates arrive score-sorted from join/orphan sorts)
    W = min(cfg.weight_width, joined["txp"].shape[1])
    joined_w = {k: (v[:, :W] if v.ndim == 2 else v)
                for k, v in joined.items()}
    tlen = jnp.take(dev["txp_lens"],
                    jnp.clip(joined_w["txp"], 0, cfg.num_txps - 1),
                    mode="clip")
    left_orph = joined["mate_status"] == MS_LEFT_ORPHAN
    rlen_mapped = jnp.where(left_orph, batch["lengths_l"],
                            batch["lengths_r"])
    eq_txp, eq_w, frag_ok, aln_valid, wn, eq_bins, fextras = \
        _filter_and_weight(
            joined_w, fld_logpmf, compat_paired, compat_orphan,
            batch["lengths_l"] + batch["lengths_r"], cfg,
            aln_score=None if aln_score is None else aln_score[:, :W],
            perfect_score=None if perfect is None else perfect[:, :W],
            tlen=tlen, rlen_mapped=rlen_mapped)
    frag_ok = frag_ok & real_row
    aln_valid = aln_valid & real_row[:, None]
    eq_txp = jnp.where(aln_valid, eq_txp, INVALID_TXP)
    eq_w = jnp.where(aln_valid, eq_w, 0.0)
    eq_bins = jnp.where(aln_valid, eq_bins, -1)

    # online per-transcript mass (EM initialization; reference analog:
    # Transcript::addMass over the online SVI pass)
    txp_mass = jnp.zeros(cfg.num_txps, jnp.float32).at[
        jnp.clip(eq_txp, 0, cfg.num_txps - 1)].add(
        jnp.where(aln_valid, wn, 0.0))

    # --- FLD observation: posterior-weighted fragment lengths of paired
    # mappings (reference samples FLD pre-burn-in with aln posteriors,
    # SalmonQuantify.cpp:974-982). Using the best paired hit's length.
    is_paired = (joined["mate_status"] == MS_PAIRED) & frag_ok
    best_i = jnp.argmax(joined["score"], axis=1)
    take_best = lambda a: jnp.take_along_axis(a, best_i[:, None],
                                              axis=1)[:, 0]
    best_flen = take_best(joined["frag_len"])
    best_txp = take_best(joined["txp"])
    best_pos = take_best(joined["pos"])
    best_fw = take_best(joined["fw"])
    fld_hist = jnp.zeros(cfg.fld_max + 1, jnp.float32).at[
        jnp.clip(best_flen, 0, cfg.fld_max)].add(
        jnp.where(is_paired, 1.0, 0.0))

    # --- observed library-format counts (lib_format_counts.json).
    # Counted over fragments with a concordant mapping BEFORE the compat
    # filter (the reference's counters track observed hit types in
    # processReads, independent of the expected-format filtering).
    obs_best = jnp.take_along_axis(joined["obs_code"], best_i[:, None],
                                   axis=1)[:, 0]
    is_paired_obs = ((joined["mate_status"] == MS_PAIRED)
                     & joined["valid"][:, 0] & real_row)
    fmt_hist = jnp.zeros(6, jnp.int32).at[jnp.clip(obs_best, 0, 5)].add(
        jnp.where(is_paired_obs, 1, 0))

    n_real = jnp.sum(real_row.astype(jnp.int32))
    out = {
        "num_orphans_rescued": n_rescued,
        "best_txp": best_txp,
        "best_pos": best_pos,
        "best_flen": best_flen,
        "best_fw": best_fw,
        "best_is_paired": is_paired,
        "eq_txp": eq_txp,
        "eq_weight": eq_w,
        "eq_bins": eq_bins,
        "frag_ok": frag_ok,
        "txp_mass": txp_mass,
        "num_processed": n_real,
        "num_mapped": jnp.sum(frag_ok.astype(jnp.int32)),
        "num_paired": jnp.sum(is_paired.astype(jnp.int32)),
        "num_orphans": jnp.sum(
            (frag_ok & (joined["mate_status"] != MS_PAIRED)).astype(
                jnp.int32)),
        "num_decoy_fragments": jnp.sum(
            (fextras["decoy_frag"] & real_row).astype(jnp.int32)),
        "num_dovetail_fragments": jnp.sum(
            (paired["has_dovetail_only"] & ~frag_ok & real_row).astype(
                jnp.int32)),
        "num_frags_filtered_vm": jnp.sum(
            (fextras["had_pre"] & ~frag_ok & ~fextras["decoy_frag"]
             & real_row).astype(jnp.int32)),
        "num_alns_below_threshold": jnp.sum(
            jnp.where(frag_ok & real_row, fextras["below_thresh"], 0)),
        "seed_tail_over": seed_tail_over,
        "fld_hist": fld_hist,
        "fmt_hist": fmt_hist,
    }
    if cfg.write_orphan_links:
        # orphaned mappings of BOTH ends for fragments without a
        # concordant pair (--writeOrphanLinks side output; the host
        # formats the `txp,pos\t...:txp,pos\t...` lines)
        no_pair = (~paired["has_pair"]) & real_row
        out["orphl_txp"] = jnp.where(orph_l["valid"], orph_l["txp"], -1)
        out["orphl_pos"] = orph_l["pos"]
        out["orphr_txp"] = jnp.where(orph_r["valid"], orph_r["txp"], -1)
        out["orphr_pos"] = orph_r["pos"]
        out["orph_link_row"] = no_pair
    return out


def map_single_batch_impl(batch: dict, dev: dict, cfg: MapperConfig,
                          fld_logpmf=None, compat_single=None):
    """Map one single-end batch (reference: processReads single-end
    overload, SalmonQuantify.cpp:1881-2325)."""
    cands = _seed_candidates(
        [batch["codes"]], [batch["lengths"]], dev, cfg)
    return map_single_from_cands(cands, batch, dev, cfg, fld_logpmf,
                                 compat_single)


def map_single_from_cands(cands, batch: dict, dev: dict,
                          cfg: MapperConfig, fld_logpmf=None,
                          compat_single=None):
    """Single-end stages 4-6 from pre-scored candidates (see
    map_paired_from_cands)."""
    [(cand, start)] = cands
    seed_tail_over = cand.pop("tail_over", jnp.int32(0))
    hits = orphan_hits(cand, start, MS_PAIRED, cfg.max_pair_cands)
    # single-end compat: table over observed (fw, rc)
    joined = dict(hits)
    joined["mate_status"] = jnp.full(
        cand["txp"].shape[0], MS_PAIRED, jnp.int32)
    # reuse paired machinery with a compat table derived from fw flag:
    # obs_code 0 for fw, 1 for rc; build a 6-wide table padded with False.
    obs = jnp.where(joined["fw"], 0, 1)
    joined["obs_code"] = obs
    compat6 = jnp.concatenate(
        [compat_single, jnp.zeros(4, dtype=bool)])
    joined["frag_len"] = jnp.zeros_like(joined["score"])
    aln_score = perfect = None
    if cfg.validate_mappings:
        aln_score, perfect = _dp_scores(joined, batch, dev, cfg,
                                        single_end=True)
    real_row = batch["lengths"] > 0
    W = min(cfg.weight_width, joined["txp"].shape[1])
    joined_w = {k: (v[:, :W] if (hasattr(v, "ndim") and v.ndim == 2)
                    else v) for k, v in joined.items()}
    tlen = jnp.take(dev["txp_lens"],
                    jnp.clip(joined_w["txp"], 0, cfg.num_txps - 1),
                    mode="clip")
    eq_txp, eq_w, frag_ok, aln_valid, wn, eq_bins, fextras = \
        _filter_and_weight(
            joined_w, fld_logpmf, compat6,
            jnp.ones((2, 2), dtype=bool), batch["lengths"], cfg,
            aln_score=None if aln_score is None else aln_score[:, :W],
            perfect_score=None if perfect is None else perfect[:, :W],
            tlen=tlen, rlen_mapped=batch["lengths"], single_end=True)
    frag_ok = frag_ok & real_row
    aln_valid = aln_valid & real_row[:, None]
    eq_txp = jnp.where(aln_valid, eq_txp, INVALID_TXP)
    eq_w = jnp.where(aln_valid, eq_w, 0.0)
    eq_bins = jnp.where(aln_valid, eq_bins, -1)
    txp_mass = jnp.zeros(cfg.num_txps, jnp.float32).at[
        jnp.clip(eq_txp, 0, cfg.num_txps - 1)].add(
        jnp.where(aln_valid, wn, 0.0))

    n_real = jnp.sum(real_row.astype(jnp.int32))
    fw_best = jnp.take_along_axis(
        joined["fw"], jnp.argmax(joined["score"], axis=1)[:, None],
        axis=1)[:, 0]
    fmt_hist = jnp.zeros(6, jnp.int32).at[
        jnp.where(fw_best, 0, 1)].add(jnp.where(frag_ok, 1, 0))
    return {
        "eq_txp": eq_txp,
        "eq_weight": eq_w,
        "eq_bins": eq_bins,
        "frag_ok": frag_ok,
        "txp_mass": txp_mass,
        "num_processed": n_real,
        "num_mapped": jnp.sum(frag_ok.astype(jnp.int32)),
        "num_paired": jnp.int32(0),
        "num_orphans": jnp.int32(0),
        "num_orphans_rescued": jnp.int32(0),
        "num_decoy_fragments": jnp.sum(
            (fextras["decoy_frag"] & real_row).astype(jnp.int32)),
        "num_dovetail_fragments": jnp.int32(0),
        "num_frags_filtered_vm": jnp.sum(
            (fextras["had_pre"] & ~frag_ok & ~fextras["decoy_frag"]
             & real_row).astype(jnp.int32)),
        "num_alns_below_threshold": jnp.sum(
            jnp.where(frag_ok & real_row, fextras["below_thresh"], 0)),
        "seed_tail_over": seed_tail_over,
        "fld_hist": jnp.zeros(cfg.fld_max + 1, jnp.float32),
        "fmt_hist": fmt_hist,
    }


# jitted single-device entry points (cfg is static)
map_paired_batch = functools.partial(jax.jit, static_argnums=(2,))(
    map_paired_batch_impl)
map_single_batch = functools.partial(jax.jit, static_argnums=(2,))(
    map_single_batch_impl)
