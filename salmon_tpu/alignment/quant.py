"""Alignment-based quantification (`salmon quant -a <bam> -t <fasta>`).

Reference: salmonAlignmentQuantify / quantifyLibrary / processMiniBatch
(src/alignment/SalmonQuantifyAlignments.cpp:1524,940,126) over htslib
BAMQueue input. Here the native BGZF/BAM reader (native/bamreader.cpp)
streams flat record arrays; fragments are grouped by read-name adjacency
with vectorized numpy; per-alignment weights combine the fragment-length
probability, library-format compatibility, and an error-model likelihood
(alignment-score based when the mismatch transition model is disabled);
the same collapsed EM/VBEM and writers as mapping mode finish the job.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import numpy as np

from salmon_tpu.alignment.bamio import (BamReader, FLAG_PAIRED,
                                        FLAG_READ1, FLAG_READ2,
                                        FLAG_REVERSE, FLAG_UNMAPPED)
from salmon_tpu.inference.eqclasses import EquivalenceClassAccumulator
from salmon_tpu.models.fld import FragmentLengthDistribution
from salmon_tpu.utils import libformat

logger = logging.getLogger("salmon_tpu")

INVALID_TXP = 0x7FFFFFFF


def _load_targets(fasta_path: str):
    from salmon_tpu.io.fasta import load_transcripts
    records, info = load_transcripts(fasta_path, noclip_polya=True)
    names = [r.name for r in records]
    lens = np.array([r.seq_codes.shape[0] for r in records],
                    dtype=np.int64)
    return names, lens, records


def _group_fragments(b, paired: bool):
    """Vectorized fragment grouping of one BamBatch.

    Returns (frag_id, keep, txp, flen, obs_code, score) per RECORD for
    single-end, or per R1-RECORD for paired (each R1 paired with the next
    record of the same fragment).
    """
    n = b.n
    flag = b.flag[:n].astype(np.int64)
    mapped = (flag & FLAG_UNMAPPED) == 0
    refid = b.refid[:n]
    new_frag = np.ones(n, dtype=bool)
    new_frag[1:] = b.name_hash[1:n] != b.name_hash[:n - 1]
    frag_id = np.cumsum(new_frag) - 1

    if not paired:
        fw = (flag & FLAG_REVERSE) == 0
        obs = np.where(fw, 0, 1)
        keep = mapped & (refid >= 0)
        score = np.where(b.as_tag[:n] > np.iinfo(np.int32).min,
                         b.as_tag[:n], 0)
        idx = np.arange(n)
        return (frag_id, keep, refid, b.read_len[:n].astype(np.int64),
                obs, score, (flag & FLAG_REVERSE) == 0, b.pos[:n],
                idx, idx)

    # paired: R1 record + immediately-following R2 record of the same
    # fragment form one alignment (htslib/BAMQueue pairing convention)
    is_r1 = (flag & FLAG_READ1) != 0
    nxt_same = np.zeros(n, dtype=bool)
    nxt_same[:n - 1] = frag_id[1:] == frag_id[:n - 1]
    nxt_is_r2 = np.zeros(n, dtype=bool)
    nxt_is_r2[:n - 1] = (b.flag[1:n].astype(np.int64) & FLAG_READ2) != 0
    a1 = is_r1 & nxt_same & nxt_is_r2
    i1 = np.nonzero(a1)[0]
    i2 = i1 + 1
    keep = (mapped[i1] & mapped[i2] & (refid[i1] >= 0)
            & (refid[i1] == refid[i2]))
    fw1 = (flag[i1] & FLAG_REVERSE) == 0
    fw2 = (flag[i2] & FLAG_REVERSE) == 0
    p1 = b.pos[i1].astype(np.int64)
    p2 = b.pos[i2].astype(np.int64)
    flen = np.abs(b.tlen[i1].astype(np.int64))
    # observed format code (reference hitType, SalmonUtils.cpp:531-576)
    opp = fw1 != fw2
    obs = np.where(
        opp & fw1, np.where(p1 <= p2, 0, 1),
        np.where(opp, np.where(p2 <= p1, 2, 3), np.where(fw1, 4, 5)))
    s1 = np.where(b.as_tag[i1] > np.iinfo(np.int32).min, b.as_tag[i1], 0)
    s2 = np.where(b.as_tag[i2] > np.iinfo(np.int32).min, b.as_tag[i2], 0)
    return (frag_id[i1], keep, refid[i1], flen, obs, s1 + s2, fw1,
            np.minimum(p1, p2), i1, i2)


def _posterior_sample_bam(args, opts, out_dir, counts, eff, name_to_id,
                          fld, lib_fmt, paired: bool) -> None:
    """--sampleOut: re-walk the BAM and emit one posterior-sampled record
    (pair) per fragment as postSample.bam (reference
    salmon::sampler::sampleLibrary; the sampling weight here is
    abundance/effLen x FLD x compat — the error-model term is omitted in
    this pass)."""
    from salmon_tpu.alignment.sampler import BamWriter, sample_fragments

    rng = np.random.default_rng(getattr(args, "seed", 271828))
    log_alpha = np.log(np.maximum(counts / np.maximum(eff, 1.0), 1e-300))
    log_pmf = fld.log_pmf()
    fmt = libformat.parse_library_format(lib_fmt)
    writer = None
    n_out = 0
    for bam_path in args.alignments:
        rdr = BamReader(bam_path, want_names=True)
        if writer is None:
            writer = BamWriter(os.path.join(out_dir, "postSample.bam"),
                               rdr.ref_names, rdr.ref_lens)
        ref_map = np.array(
            [name_to_id.get(nm, -1) for nm in rdr.ref_names],
            dtype=np.int64)
        for b in rdr.batches():
            (frag_id, keep, refid, flen, obs, score, fw, pos, i1, i2) = \
                _group_fragments(b, paired)
            txp = np.where(keep & (refid >= 0),
                           ref_map[np.clip(refid, 0,
                                           len(ref_map) - 1)], -1)
            keep = keep & (txp >= 0)

            def emit(ridx, zw=None):
                co = b.cigar_op[b.cigar_off[ridx]:
                                b.cigar_off[ridx] + b.cigar_n[ridx]]
                cl = b.cigar_oplen[b.cigar_off[ridx]:
                                   b.cigar_off[ridx] + b.cigar_n[ridx]]
                seq = b.seq_buf[b.seq_off[ridx]:
                                b.seq_off[ridx] + b.read_len[ridx]]
                writer.add_record(
                    b.names[ridx], int(b.refid[ridx]), int(b.pos[ridx]),
                    int(b.flag[ridx]), int(b.mapq[ridx]), co, cl, seq,
                    int(b.mate_refid[ridx]), int(b.mate_pos[ridx]),
                    int(b.tlen[ridx]), zw=zw)

            if getattr(args, "sampleUnaligned", False):
                # pass unassigned fragments through verbatim (reference
                # --sampleUnaligned)
                uniq, first = np.unique(frag_id, return_index=True)
                has_keep = np.zeros(int(frag_id.max()) + 1, bool)
                has_keep[frag_id[keep]] = True
                for s in first[~has_keep[uniq]]:
                    emit(int(i1[s]))
                    if paired:
                        emit(int(i2[s]))

            if not keep.any():
                continue
            k = np.nonzero(keep)[0]
            if paired:
                compat = libformat.paired_compat_table(fmt)[
                    np.clip(obs[k], 0, 5)]
                lf = log_pmf[np.clip(flen[k], 0, opts.max_frag_length)]
            else:
                compat = libformat.single_compat_table(fmt)[
                    np.clip(obs[k], 0, 1)]
                lf = 0.0
            logw = log_alpha[txp[k]] + lf + np.where(compat, 0.0, -30.0)
            w = np.exp(logw - logw.max())
            sel = sample_fragments(rng, frag_id[k], w)
            for s in sel:
                emit(int(i1[k[s]]), zw=float(w[s]))
                if paired:
                    emit(int(i2[k[s]]), zw=float(w[s]))
                n_out += 1
        rdr.close()
    if writer is not None:
        writer.close()
    logger.info("posterior-sampled BAM: %d fragments -> %s", n_out,
                os.path.join(out_dir, "postSample.bam"))


def quantify_alignments(args, opts, cmd_args) -> int:
    from salmon_tpu.inference import em as em_mod
    from salmon_tpu.io import writers
    from salmon_tpu.models.efflen import effective_lengths

    t0 = time.time()
    if not args.targets:
        logger.error("alignment-based mode requires -t/--targets")
        return 1
    names, tlens, _records = _load_targets(args.targets)
    name_to_id = {nm: i for i, nm in enumerate(names)}

    lib_fmt = args.libType.strip().upper()
    auto = lib_fmt == "A"

    acc = EquivalenceClassAccumulator()
    fld = FragmentLengthDistribution(
        max_val=opts.max_frag_length, prior_mu=opts.frag_len_prior_mean,
        prior_sigma=opts.frag_len_prior_sd)
    num_processed = 0
    num_mapped = 0
    fmt_hist = np.zeros(6, dtype=np.int64)
    score_exp = getattr(args, "scoreExp", 1.0) or 1.0
    paired_detect: Optional[bool] = None

    # concatenated target arrays for the error model's reference walk
    tseq_off = np.zeros(len(names) + 1, dtype=np.int64)
    tseq_off[1:] = np.cumsum([r.seq_codes.shape[0] for r in _records])
    tseq_codes = (np.concatenate([r.seq_codes for r in _records])
                  if _records else np.zeros(0, np.uint8))

    # --- error model training pass (reference: burn-in updates in
    # processMiniBatch, SalmonQuantifyAlignments.cpp:126+)
    use_ont = bool(getattr(args, "ont", False))
    if use_ont:
        # --ont forces noLengthCorrection (ProgramOptionsGenerator:332)
        opts.no_length_correction = True
    use_error_model = not getattr(args, "noErrorModel", False) and \
        not use_ont
    err = None
    ont = None
    if use_ont:
        from salmon_tpu.alignment.errormodel import ONTErrorModel
        ont = ONTErrorModel()
    if use_error_model:
        from salmon_tpu.alignment.errormodel import AlignmentErrorModel
        err = AlignmentErrorModel()
    if err is not None or ont is not None:
        trained = 0
        train_cap = int(getattr(args, "numPreAuxModelSamples", 5000)
                        or 5000) * 200  # fragments
        for bam_path in args.alignments:
            if trained >= train_cap:
                break
            rdr = BamReader(bam_path)
            ref_map0 = np.array(
                [name_to_id.get(nm, -1) for nm in rdr.ref_names],
                dtype=np.int64)
            for b in rdr.batches():
                if paired_detect is None:
                    paired_detect = bool(b.flag[0] & FLAG_PAIRED)
                    if auto:
                        lib_fmt = "IU" if paired_detect else "U"
                (frag_id, keep, refid, flen, obs, score, fw, pos, i1,
                 i2) = _group_fragments(b, paired_detect)
                txp = np.where(keep & (refid >= 0),
                               ref_map0[np.clip(refid, 0,
                                                len(ref_map0) - 1)], -1)
                keep = keep & (txp >= 0)
                if not keep.any():
                    continue
                # posterior-ish weights from AS within each fragment
                sc = score.astype(np.float64)
                order = np.argsort(frag_id, kind="stable")
                inv = np.argsort(order)
                fid_s = frag_id[order]
                st = np.concatenate(
                    [[0], np.nonzero(fid_s[1:] != fid_s[:-1])[0] + 1])
                cnt = np.diff(np.concatenate([st, [fid_s.shape[0]]]))
                mx = np.maximum.reduceat(sc[order], st)
                wts = np.exp(score_exp * (sc[order] - np.repeat(mx, cnt)))
                ws = np.zeros(len(frag_id))
                ws[order] = wts
                ws = np.where(keep, ws, 0.0)
                ksel = np.nonzero(keep)[0]
                if ont is not None:
                    ont.update(b.read_len[i1[ksel]].astype(np.int64),
                               b.nm_tag[i1[ksel]].astype(np.int64),
                               ws[ksel])
                    if paired_detect:
                        ont.update(b.read_len[i2[ksel]].astype(np.int64),
                                   b.nm_tag[i2[ksel]].astype(np.int64),
                                   ws[ksel])
                else:
                    from salmon_tpu.alignment.errormodel import \
                        expand_batch
                    cols1 = expand_batch(b, i1[ksel], ref_map0,
                                         tseq_codes, tseq_off, tlens)
                    err.update(cols1, ws[ksel], 0)
                    if paired_detect:
                        cols2 = expand_batch(b, i2[ksel], ref_map0,
                                             tseq_codes, tseq_off, tlens)
                        err.update(cols2, ws[ksel], 1)
                trained += int(keep.sum())
                if trained >= train_cap:
                    break
            rdr.close()
        (ont or err).normalize()
        logger.info("%s error model trained on %d alignments",
                    "ONT" if ont is not None else "mismatch-transition",
                    trained)

    for bam_path in args.alignments:
        rdr = BamReader(bam_path)
        # map BAM refs -> target ids by name (reference validates the
        # header against the -t FASTA)
        ref_map = np.full(len(rdr.ref_names), -1, dtype=np.int64)
        n_matched = 0
        for i, nm in enumerate(rdr.ref_names):
            j = name_to_id.get(nm)
            if j is not None:
                ref_map[i] = j
                n_matched += 1
        if n_matched == 0:
            logger.error("no BAM reference names match the target FASTA")
            return 1

        for b in rdr.batches():
            if paired_detect is None:
                paired_detect = bool(b.flag[0] & FLAG_PAIRED)
                if auto:
                    lib_fmt = "IU" if paired_detect else "U"
            (frag_id, keep, refid, flen, obs, score, fw, pos, i1, i2) = \
                _group_fragments(b, paired_detect)
            txp = np.where(keep & (refid >= 0),
                           ref_map[np.clip(refid, 0, len(ref_map) - 1)],
                           -1)
            keep = keep & (txp >= 0)

            # error-model log-likelihood per alignment (fg - bg)
            err_ll = np.zeros(len(frag_id))
            if ont is not None and keep.any():
                ksel = np.nonzero(keep)[0]
                ll = ont.log_likelihood(
                    b.read_len[i1[ksel]].astype(np.int64),
                    b.nm_tag[i1[ksel]].astype(np.int64))
                if paired_detect:
                    ll = ll + ont.log_likelihood(
                        b.read_len[i2[ksel]].astype(np.int64),
                        b.nm_tag[i2[ksel]].astype(np.int64))
                err_ll[ksel] = ll
            elif err is not None and keep.any():
                from salmon_tpu.alignment.errormodel import expand_batch
                ksel = np.nonzero(keep)[0]
                c1 = expand_batch(b, i1[ksel], ref_map, tseq_codes,
                                  tseq_off, tlens)
                ll = err.log_likelihood(c1, ksel.size, 0)
                if paired_detect:
                    c2 = expand_batch(b, i2[ksel], ref_map, tseq_codes,
                                      tseq_off, tlens)
                    ll = ll + err.log_likelihood(c2, ksel.size, 1)
                err_ll[ksel] = ll

            # per-fragment processing (vectorized over the batch)
            uniq_frags = np.unique(frag_id)
            num_processed += uniq_frags.shape[0]
            if not keep.any():
                continue

            fid = frag_id[keep]
            txp_k = txp[keep]
            flen_k = flen[keep]
            obs_k = obs[keep]
            score_k = score[keep].astype(np.float64)
            err_k = err_ll[keep]

            # fragment-length prob + compat from expected format
            fmt = libformat.parse_library_format(lib_fmt)
            if paired_detect:
                compat = libformat.paired_compat_table(fmt)[
                    np.clip(obs_k, 0, 5)]
            else:
                compat = libformat.single_compat_table(fmt)[
                    np.clip(obs_k, 0, 1)]
            log_pmf = fld.log_pmf()
            lf = log_pmf[np.clip(flen_k, 0, opts.max_frag_length)] \
                if paired_detect else 0.0
            # per-alignment weight: error-model log-likelihood when
            # trained (reference processMiniBatch: AlignmentModel
            # logLikelihood replaces the coverage term), else the
            # AS-based stand-in
            if err is not None or ont is not None:
                logw = err_k + lf
            else:
                logw = score_exp * score_k + lf
            logw = np.where(compat, logw,
                            logw + (np.log(opts.incompat_prior)
                                    if opts.incompat_prior > 0 else -1e30))

            order = np.argsort(fid, kind="stable")
            fid, txp_k, flen_k, obs_k, logw = (
                fid[order], txp_k[order], flen_k[order], obs_k[order],
                logw[order])
            starts = np.concatenate(
                [[0], np.nonzero(fid[1:] != fid[:-1])[0] + 1])
            counts = np.diff(np.concatenate([starts, [fid.shape[0]]]))
            max_w = np.maximum.reduceat(logw, starts)
            w = np.exp(logw - np.repeat(max_w, counts))
            valid_w = w > opts.min_aln_prob

            # build fixed-width eq tensors (rows = fragments)
            F = starts.shape[0]
            T2 = int(counts.max())
            eq_txp = np.full((F, T2), INVALID_TXP, dtype=np.int32)
            eq_w = np.zeros((F, T2), dtype=np.float32)
            row = np.repeat(np.arange(F), counts)
            col = np.arange(fid.shape[0]) - np.repeat(starts, counts)
            sel = valid_w
            eq_txp[row[sel], col[sel]] = txp_k[sel]
            eq_w[row[sel], col[sel]] = w[sel]
            # collapse duplicate txps within a fragment + sort labels
            o2 = np.argsort(eq_txp, axis=1, kind="stable")
            eq_txp = np.take_along_axis(eq_txp, o2, axis=1)
            eq_w = np.take_along_axis(eq_w, o2, axis=1)
            dup = np.zeros_like(eq_txp, dtype=bool)
            dup[:, 1:] = (eq_txp[:, 1:] == eq_txp[:, :-1]) & (
                eq_txp[:, 1:] != INVALID_TXP)
            # merge dup weights leftward
            for j in range(1, T2):
                m = dup[:, j]
                if m.any():
                    eq_w[m, j - 1] += eq_w[m, j]
                    eq_w[m, j] = 0.0
                    eq_txp[m, j] = INVALID_TXP
            o3 = np.argsort(
                np.where(eq_txp == INVALID_TXP, INVALID_TXP, eq_txp),
                axis=1, kind="stable")
            eq_txp = np.take_along_axis(eq_txp, o3, axis=1)
            eq_w = np.take_along_axis(eq_w, o3, axis=1)

            has = eq_txp[:, 0] != INVALID_TXP
            num_mapped += int(has.sum())
            acc.add_batch(eq_txp, eq_w, None)

            # FLD + format stats from the valid alignments
            if paired_detect:
                good = (obs_k >= 0) & (flen_k > 0) & valid_w
                hist = np.bincount(
                    np.clip(flen_k[good], 0, opts.max_frag_length),
                    minlength=opts.max_frag_length + 1).astype(np.float64)
                # one FLD observation per fragment: divide by avg alns
                hist *= F / max(1, good.sum())
                fld.add_observations(hist)
                fmt_hist += np.bincount(np.clip(obs_k[good], 0, 5),
                                        minlength=6)

    if num_mapped < opts.min_assigned_frags:
        writers.write_empty_outputs(args.output, "aux_info", names,
                                    tlens)
        logger.error("only %d assigned fragments (min %d)", num_mapped,
                     opts.min_assigned_frags)
        return 1

    eq = acc.finish()
    eff = effective_lengths(
        tlens, fld.pmf(),
        no_length_correction=opts.no_length_correction,
        no_effective_length_correction=opts.no_effective_length_correction)

    emc = em_mod.EMConfig(
        use_vbem=opts.use_vb_opt and not opts.use_em,
        vb_prior=opts.vb_prior,
        per_transcript_prior=opts.per_transcript_prior,
        rel_diff_tolerance=opts.relative_diff_tolerance,
        max_iterations=opts.max_em_iterations,
        min_iterations=opts.min_em_iterations)
    res = em_mod.optimize(eq, len(names), eff, config=emc)
    counts = res["alphas"]

    out = args.output
    writers.write_quant_sf(out, names, tlens, eff, counts,
                           sig_digits=opts.sig_digits)
    writers.write_cmd_info(out, cmd_args)
    fmt_counts = {nm: int(fmt_hist[i]) for i, nm in
                  enumerate(libformat.format_names_paired())}
    writers.write_lib_format_counts(out, lib_fmt, fmt_counts, num_mapped,
                                    num_processed, num_mapped)
    writers.write_meta_info(out, "aux_info", {
        "opt_type": "vb" if emc.use_vbem else "em",
        "mapping_type": "alignment",
        "library_types": [lib_fmt],
        "num_valid_targets": len(names),
        "num_eq_classes": eq.num_classes,
        "num_processed": num_processed,
        "num_mapped": num_mapped,
        "percent_mapped": 100.0 * num_mapped / max(1, num_processed),
        "num_em_iterations": res["iterations"],
        "em_converged": res["converged"],
    })
    writers.write_fld(out, "aux_info", fld.pmf())
    if getattr(args, "sampleOut", False):
        _posterior_sample_bam(args, opts, out, counts, eff, name_to_id,
                              fld, lib_fmt, bool(paired_detect))
    if args.dumpEq or args.dumpEqWeights:
        writers.write_eq_classes(out, "aux_info", names, eq,
                                 dump_weights=True, eff_lens=eff)
    if args.geneMap:
        from salmon_tpu.utils.genemap import aggregate_quant_sf
        aggregate_quant_sf(os.path.join(out, "quant.sf"), args.geneMap)
    logger.info("alignment-mode quantification written to %s (%.1fs)",
                out, time.time() - t0)
    return 0
