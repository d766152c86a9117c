"""End-to-end quantification orchestration.

Reference flow (SURVEY.md §3.2): salmonQuantify -> quantifyLibrary ->
processReads workers -> eq classes -> CollapsedEMOptimizer::optimize ->
GZipWriter outputs. Here: stream fixed-shape chunks -> jitted map batch ->
host eq-class/FLD/counter accumulation -> effective lengths -> jitted
EM/VBEM -> writers.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from salmon_tpu.constants import DEFAULTS, SalmonDefaults
from salmon_tpu.index.builder import TranscriptomeIndex, load_index
from salmon_tpu.inference import em as em_mod
from salmon_tpu.inference.eqclasses import EquivalenceClassAccumulator
from salmon_tpu.io import writers
from salmon_tpu.io.fastq import iter_paired_chunks, iter_single_chunks
from salmon_tpu.mapping.pipeline import (MapperConfig, device_index_arrays,
                                         map_paired_batch, map_single_batch)
from salmon_tpu.models.efflen import effective_lengths
from salmon_tpu.models.fld import FragmentLengthDistribution
from salmon_tpu.utils import libformat

logger = logging.getLogger("salmon_tpu")


@dataclasses.dataclass
class QuantResult:
    names: list
    counts: np.ndarray
    eff_lens: np.ndarray
    tpm: np.ndarray
    num_processed: int
    num_mapped: int
    num_paired: int
    num_orphans: int
    em_info: dict
    fmt_counts: dict
    num_orphans_rescued: int = 0
    eq_classes: object = None
    fld: object = None
    lib_format: str = ""
    bias: object = None
    mapping_stats: dict = dataclasses.field(default_factory=dict)


class InsufficientAssignedFragments(RuntimeError):
    """Reference: SalmonExceptions / minAssignedFrags gate."""


class ForgettingMass:
    """SVI step-size schedule (reference ForgettingMassCalculator,
    include/salmon/internal/quant/ForgettingMassCalculator.hpp:23-64):
    logMass_t += ff*log(t-1) - log(t^ff - 1), applied per device batch
    (the batch is our minibatch timestep)."""

    def __init__(self, forgetting_factor: float = 0.65):
        self.ff = forgetting_factor
        self.log_mass = 0.0
        self.t = 0

    def next_log_mass(self) -> float:
        self.t += 1
        if self.t > 1:
            self.log_mass += (self.ff * np.log(self.t - 1)
                              - np.log(self.t ** self.ff - 1))
        return self.log_mass


DETECT_SAMPLES_NEEDED = 50_000  # LibraryTypeDetector numSamplesNeeded_


def _detect_library_format(fmt_hist: np.ndarray, paired: bool) -> str:
    """Auto-detect '-l A' from the accumulated observed orientation
    histogram (reference LibraryTypeDetector::mostLikelyType,
    model/LibraryTypeDetector.hpp:34-143): orientation by argmax, then
    strandedness with the 30%/70% forward-ratio bands."""
    names = libformat.format_names_paired()
    if not paired:
        fw, rc = int(fmt_hist[0]), int(fmt_hist[1])
        tot = fw + rc
        if tot == 0:
            return "U"
        ratio = fw / tot
        if ratio < 0.3:
            return "SR"
        if ratio < 0.7:
            return "U"
        return "SF"
    counts = {names[i]: int(fmt_hist[i]) for i in range(6)}
    o_tot = {"I": counts["ISF"] + counts["ISR"],
             "O": counts["OSF"] + counts["OSR"],
             "M": counts["MSF"] + counts["MSR"]}
    if sum(o_tot.values()) == 0:
        return "IU"
    # argmax with the reference's tie order (inward >= outward >= same)
    o = "I"
    if o_tot["O"] > o_tot["I"]:
        o = "O"
    if o_tot["M"] > o_tot[o]:
        o = "M"
    # strandedness ratio pools ALL orientations (reference nsf/nsr)
    sf = counts["ISF"] + counts["OSF"] + counts["MSF"]
    sr = counts["ISR"] + counts["OSR"] + counts["MSR"]
    st = sf + sr
    if st == 0:
        return o + "U"
    ratio = sf / st
    if ratio < 0.3:
        return o + "SR"
    if ratio < 0.7:
        return o + "U"
    return o + "SF"


def _mark_auxiliary_targets(index, opts):
    """--auxTargetFile (reference salmon::utils::markAuxiliaryTargets,
    SalmonUtils.cpp:1133-1194): transcripts named in the file are marked
    to skip bias correction. Returns a bool mask over valid targets (or
    None) and records the ids for aux_target_ids.json."""
    path = getattr(opts, "aux_target_file", "") or ""
    if not path:
        return None
    import os
    if not os.path.exists(path):
        logger.warning("The auxiliary target file %s does not exist. "
                       "No targets will be treated as auxiliary.", path)
        return None
    with open(path) as fh:
        names = set(fh.read().split())
    logger.info("Parsed %d auxiliary targets from %s", len(names), path)
    n = index.num_valid_targets
    mask = np.zeros(n, dtype=bool)
    for i, nm in enumerate(index.names[:n]):
        if nm in names:
            mask[i] = True
    found = int(mask.sum())
    if found != len(names):
        logger.warning("While %d auxiliary target names were found in "
                       "%s, only %d matched index transcripts.",
                       len(names), path, found)
    opts._aux_target_ids = np.nonzero(mask)[0].tolist()
    return mask


def _write_sam_batch(fh, index, names, chunk, out, paired: bool) -> None:
    """SAM records for each mapped fragment's best alignment
    (--writeMappings; approximate CIGAR = full-length match, like the
    reference's SCORE_ONLY alignment mode)."""
    from salmon_tpu.utils.dna import decode_seq, revcomp_codes

    ok = np.asarray(out["frag_ok"])
    txp = np.asarray(out["best_txp"])
    pos = np.asarray(out["best_pos"])
    fw = np.asarray(out["best_fw"])
    flen = np.asarray(out["best_flen"])
    is_p = np.asarray(out["best_is_paired"]) if paired else None
    c1 = chunk.left.codes if paired else chunk.codes
    l1 = chunk.left.lengths if paired else chunk.lengths
    if paired:
        c2 = chunk.right.codes
        l2 = chunk.right.lengths
    n_valid = chunk.n_valid
    for i in range(n_valid):
        if not ok[i] or txp[i] >= index.num_valid_targets:
            continue
        nm = names[i]
        nm = nm.decode() if isinstance(nm, bytes) else nm
        rname = index.names[int(txp[i])]
        L1 = int(l1[i])
        seq1 = c1[i, :L1]
        if paired and is_p[i]:
            L2 = int(l2[i])
            p1 = int(pos[i]) if fw[i] else int(pos[i]) + int(flen[i]) - L1
            p2 = (int(pos[i]) + int(flen[i]) - L2 if fw[i]
                  else int(pos[i]))
            f1 = 0x1 | 0x2 | 0x40 | (0x10 if not fw[i] else 0x20)
            f2 = 0x1 | 0x2 | 0x80 | (0x20 if not fw[i] else 0x10)
            s1 = decode_seq(seq1 if fw[i] else revcomp_codes(seq1))
            seq2 = c2[i, :L2]
            s2 = decode_seq(revcomp_codes(seq2) if fw[i] else seq2)
            tl = int(flen[i])
            fh.write(f"{nm}\t{f1}\t{rname}\t{p1 + 1}\t255\t{L1}M\t=\t"
                     f"{p2 + 1}\t{tl if fw[i] else -tl}\t{s1}\t*\n")
            fh.write(f"{nm}\t{f2}\t{rname}\t{p2 + 1}\t255\t{L2}M\t=\t"
                     f"{p1 + 1}\t{-tl if fw[i] else tl}\t{s2}\t*\n")
        else:
            flag = 0 if fw[i] else 0x10
            s1 = decode_seq(seq1 if fw[i] else revcomp_codes(seq1))
            fh.write(f"{nm}\t{flag}\t{rname}\t{int(pos[i]) + 1}\t255\t"
                     f"{L1}M\t*\t0\t0\t{s1}\t*\n")


def quantify(
    index: TranscriptomeIndex | str,
    lib_format: str,
    reads1: Sequence[str],
    reads2: Optional[Sequence[str]] = None,
    opts: SalmonDefaults = DEFAULTS,
    progress: bool = True,
    unmapped_path: Optional[str] = None,
    sam_path: Optional[str] = None,
    orphan_links_path: Optional[str] = None,
) -> QuantResult:
    """Mapping-based quantification (reference: salmonQuantify,
    src/quant/SalmonQuantify.cpp:2777). When `unmapped_path` is given,
    unmapped read names are streamed there with the reference's 'u'
    reason code (--writeUnmappedNames)."""
    t0 = time.time()
    if isinstance(index, str):
        index = load_index(index)
    paired = reads2 is not None
    cfg = MapperConfig.from_index(
        index, opts, allow_no_table=opts.index_shards > 1)

    # multi-chip: shard each batch data-parallel over all devices of the
    # (possibly multi-host) mesh (reference analog: N worker threads over
    # disjoint read batches, SURVEY.md §2.11 item 2). Single device ->
    # plain jit path. --indexShards S additionally splits the k-mer
    # dictionary + occurrence CSR over a "kmer" mesh axis (genome-decoy
    # indexes that exceed one chip's HBM; parallel.sharded).
    import jax as _jax
    mesh = None
    n_dev = len(_jax.devices())
    pid, nproc = _jax.process_index(), _jax.process_count()
    multiproc = nproc > 1
    shard_bits = 0
    if opts.index_shards > 1:
        from salmon_tpu.parallel.sharded import (device_sharded_index,
                                                 make_sharded_mesh,
                                                 shard_batch_reads,
                                                 sharded_map_paired,
                                                 sharded_map_single)
        mesh = make_sharded_mesh(opts.index_shards)
        if multiproc and mesh.shape["reads"] % nproc:
            raise ValueError(
                f"mesh reads axis {mesh.shape['reads']} not divisible "
                f"by {nproc} processes (need local device count to be "
                f"a multiple of --indexShards)")
        dev, _shard_over = device_sharded_index(index, mesh)
        cfg = dataclasses.replace(cfg, n_slots=_shard_over["n_slots"],
                                  sparse_seed=True)
        shard_bits = _shard_over["shard_bits"]
        logger.info(
            "index sharded %d-way over the kmer axis; reads axis %d "
            "(mesh %s, %d hosts)", opts.index_shards,
            mesh.shape["reads"], dict(mesh.shape), nproc)
    else:
        dev = device_index_arrays(index)
        if n_dev > 1:
            from salmon_tpu.parallel import (make_mesh,
                                             parallel_map_paired,
                                             parallel_map_single,
                                             shard_batch_arrays)
            mesh = make_mesh()
            logger.info("mapping data-parallel over %d devices (%d hosts)",
                        n_dev, nproc)
    if multiproc:
        from salmon_tpu.parallel import distributed as _dist

    fld = FragmentLengthDistribution(
        max_val=opts.max_frag_length, prior_mu=opts.frag_len_prior_mean,
        prior_sigma=opts.frag_len_prior_sd)
    fmass = ForgettingMass(opts.forgetting_factor)

    acc = EquivalenceClassAccumulator()
    online_mass = np.zeros(index.num_targets, dtype=np.float64)
    totals = {"num_processed": 0, "num_mapped": 0, "num_paired": 0,
              "num_orphans": 0, "num_orphans_rescued": 0,
              "num_decoy_fragments": 0, "num_dovetail_fragments": 0,
              "num_frags_filtered_vm": 0, "num_alns_below_threshold": 0,
              "seed_tail_over": 0}
    fmt_hist_total = np.zeros(6, dtype=np.int64)

    # --- bias model state (observed stats collected per batch on device)
    bias_state = None
    bias_collect = None
    bdev = None
    aux_skip_bias = _mark_auxiliary_targets(index, opts)
    if paired and (opts.seq_bias_correct or opts.gc_bias_correct
                   or opts.pos_bias_correct):
        from salmon_tpu.models.bias import (bias_device_arrays,
                                            collect_bias_observations)
        from salmon_tpu.models.bias_correct import BiasState
        import jax as _jax
        bias_state = BiasState(index, opts)
        if aux_skip_bias is not None:
            bias_state.skip_bias = aux_skip_bias
        bdev = bias_device_arrays(index)
        bias_collect = _jax.jit(collect_bias_observations)

    auto_detect = lib_format.strip().upper() == "A"
    expected = (libformat.parse_library_format("IU" if paired else "U")
                if auto_detect else libformat.parse_library_format(lib_format))
    resolved_format = None if auto_detect else lib_format.strip().upper()

    def compat_arrays(fmt: libformat.LibraryFormat):
        return (jnp.asarray(libformat.paired_compat_table(fmt)),
                jnp.asarray(libformat.orphan_compat_table(fmt)),
                jnp.asarray(libformat.single_compat_table(fmt)))

    if auto_detect:
        # while detecting, every format is compatible (the reference runs
        # with a neutral incompatPrior until the detector can guess,
        # SalmonQuantify.cpp:691-700)
        cp = jnp.ones(6, dtype=bool)
        co = jnp.ones((2, 2), dtype=bool)
        cs = jnp.ones(2, dtype=bool)
        detect_hist = np.zeros(6, dtype=np.int64)
    else:
        cp, co, cs = compat_arrays(expected)

    want_names = unmapped_path is not None or sam_path is not None
    unmapped_fh = open(unmapped_path, "w") if unmapped_path else None
    orphan_fh = (open(orphan_links_path, "w")
                 if (orphan_links_path and paired) else None)
    sam_fh = None
    if sam_path is not None:
        import sys as _sys
        sam_fh = (_sys.stdout if sam_path == "-" else open(sam_path, "w"))
        # SAM header (reference qmLog / --writeMappings,
        # ProgramOptionsGenerator.cpp:264-271)
        sam_fh.write("@HD\tVN:1.0\tSO:unknown\n")
        for i in range(index.num_valid_targets):
            sam_fh.write(f"@SQ\tSN:{index.names[i]}\t"
                         f"LN:{int(index.complete_lengths[i])}\n")
        sam_fh.write("@PG\tID:salmon_tpu\tPN:salmon_tpu\n")
    # multi-host input policy: with >1 input file, each process streams
    # ONLY its own files (round-robin assignment — no redundant cross-
    # host parsing; the IO-affinity analog of per-NUMA worker pools);
    # with a single shared file every process parses it and keeps its
    # chunk stride. Both modes pin the chunk row width so per-process
    # rows assemble into one global batch.
    file_assign = multiproc and len(reads1) > 1
    r1_local, r2_local = reads1, reads2
    if file_assign:
        r1_local = list(reads1[pid::nproc])
        r2_local = list(reads2[pid::nproc]) if paired else None
        logger.info("process %d streams %d/%d input files", pid,
                    len(r1_local), len(reads1))
    if paired:
        chunks = iter_paired_chunks(r1_local, r2_local,
                                    opts.reads_per_batch,
                                    opts.max_read_len,
                                    want_names=want_names,
                                    fixed_len=multiproc)
    else:
        chunks = iter_single_chunks(r1_local, opts.reads_per_batch,
                                    opts.max_read_len,
                                    want_names=want_names,
                                    fixed_len=multiproc)

    # SALMON_TPU_AOT_CACHE: swap the jitted mapping entry for an
    # AOT-deserialized executable when a cached one exists for this
    # (shapes, cfg) signature — kills the multi-minute per-process
    # first compile on backends whose persistent cache does not
    # rehydrate (utils/aotcache.py; single-device path only)
    from salmon_tpu.utils import aotcache as _aot
    _aot_compiled: dict = {}

    def _map_paired_aot(batch, dev_, cfg_, fld_logpmf, cp_, co_):
        shape_sig = tuple(
            (k, tuple(v.shape), str(v.dtype))
            for k, v in sorted(batch.items()))
        comp = _aot_compiled.get(shape_sig)
        if comp is None:
            comp = _aot.compile_cached(
                map_paired_batch, repr(("paired", shape_sig, cfg_)),
                (batch, dev_, cfg_, fld_logpmf, cp_, co_),
                (batch, dev_, fld_logpmf, cp_, co_))
            _aot_compiled[shape_sig] = comp if comp is not None \
                else False
        if comp:
            return comp(batch, dev_, fld_logpmf, cp_, co_)
        return map_paired_batch(batch, dev_, cfg_, fld_logpmf, cp_, co_)

    use_aot = (_aot.cache_dir() is not None and mesh is None
               and not multiproc and opts.index_shards <= 1)

    def submit(chunk):
        """Launch the jitted map for one chunk (async dispatch: returns
        immediately with device futures)."""
        # FLD snapshot for this minibatch (the LogCMFCache refresh
        # analog, DistributionUtils.cpp:128-149); mode selects the
        # fragment-prob formulation by burn-in stage
        processed = totals["num_processed"]
        if processed < opts.num_pre_burnin_frags:
            mode = 0
        elif processed >= opts.num_burnin_frags:
            mode = 2
        else:
            mode = 1
        fld_logpmf = {
            "logpmf": jnp.asarray(fld.log_pmf(), jnp.float32),
            "logcmf": jnp.asarray(fld.log_cmf(), jnp.float32),
            "mode": jnp.int32(mode),
        }
        if paired:
            batch = {
                "codes_l": jnp.asarray(chunk.left.codes),
                "lengths_l": jnp.asarray(chunk.left.lengths),
                "codes_r": jnp.asarray(chunk.right.codes),
                "lengths_r": jnp.asarray(chunk.right.lengths),
            }
            if multiproc:
                batch = _dist.make_global_batch(mesh, batch)
                if opts.index_shards > 1:
                    out = sharded_map_paired(mesh, batch, dev, cfg,
                                             shard_bits, fld_logpmf,
                                             cp, co)
                else:
                    out = parallel_map_paired(mesh, batch, dev, cfg,
                                              fld_logpmf, cp, co)
            elif shard_bits or opts.index_shards > 1:
                batch = shard_batch_reads(mesh, batch)
                out = sharded_map_paired(mesh, batch, dev, cfg,
                                         shard_bits, fld_logpmf, cp, co)
            elif mesh is not None:
                batch = shard_batch_arrays(mesh, batch)
                out = parallel_map_paired(mesh, batch, dev, cfg,
                                          fld_logpmf, cp, co)
            elif use_aot:
                out = _map_paired_aot(batch, dev, cfg, fld_logpmf, cp,
                                      co)
            else:
                out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp,
                                       co)
        else:
            batch = {
                "codes": jnp.asarray(chunk.codes),
                "lengths": jnp.asarray(chunk.lengths),
            }
            if multiproc:
                batch = _dist.make_global_batch(mesh, batch)
                if opts.index_shards > 1:
                    out = sharded_map_single(mesh, batch, dev, cfg,
                                             shard_bits, fld_logpmf, cs)
                else:
                    out = parallel_map_single(mesh, batch, dev, cfg,
                                              fld_logpmf, cs)
            elif shard_bits or opts.index_shards > 1:
                batch = shard_batch_reads(mesh, batch)
                out = sharded_map_single(mesh, batch, dev, cfg,
                                         shard_bits, fld_logpmf, cs)
            elif mesh is not None:
                batch = shard_batch_arrays(mesh, batch)
                out = parallel_map_single(mesh, batch, dev, cfg,
                                          fld_logpmf, cs)
            else:
                out = map_single_batch(batch, dev, cfg, fld_logpmf, cs)
        return batch, out

    n_batches = 0

    def _consume(chunk, batch, out):
        nonlocal n_batches
        if multiproc:
            to_np = _dist.local_rows
        else:
            to_np = np.asarray
        acc.add_batch(to_np(out["eq_txp"]),
                      to_np(out["eq_weight"]),
                      to_np(out["eq_bins"])
                      if cfg.range_bins > 0 else None)
        if bias_state is not None:
            if multiproc:
                # collect over THIS process's rows only; the fixed-size
                # histograms are allreduced once after the stream
                # (mergeObservedBias analog)
                bt = jnp.asarray(to_np(out["best_txp"]))
                bs = jnp.asarray(to_np(out["best_pos"]))
                bf = jnp.asarray(to_np(out["best_flen"]))
                fw = jnp.asarray(to_np(out["best_fw"]))
                ip = jnp.asarray(to_np(out["best_is_paired"]))
                ll = jnp.asarray(to_np(batch["lengths_l"]))
                lr = jnp.asarray(to_np(batch["lengths_r"]))
            else:
                bt, bs, bf = (out["best_txp"], out["best_pos"],
                              out["best_flen"])
                fw, ip = out["best_fw"], out["best_is_paired"]
                ll, lr = batch["lengths_l"], batch["lengths_r"]
            be = bs + bf - 1
            bo = bias_collect(
                bdev, bt, bs, be, fw, ll, lr,
                ip & (bt < index.num_valid_targets),
                jnp.ones_like(bs, jnp.float32))
            bias_state.obs.add_batch(bo)
        fld.add_observations(np.asarray(out["fld_hist"],
                                        dtype=np.float64))
        online_mass_local = np.asarray(out["txp_mass"], dtype=np.float64)
        online_mass[:] += np.exp(fmass.next_log_mass()) * online_mass_local
        for k in totals:
            totals[k] += int(out[k])
        fmt_hist_total[:] += np.asarray(out["fmt_hist"], dtype=np.int64)
        if orphan_fh is not None and "orph_link_row" in out:
            # --writeOrphanLinks (reference SalmonQuantify.cpp:1409-1421):
            # per fragment: left `txp,pos` fields, ':', right fields
            rowsel = np.asarray(out["orph_link_row"])
            lt = np.asarray(out["orphl_txp"])
            lp = np.asarray(out["orphl_pos"])
            rt = np.asarray(out["orphr_txp"])
            rp = np.asarray(out["orphr_pos"])
            for i in np.nonzero(rowsel[:chunk.n_valid])[0]:
                left = "\t".join(f"{t},{p}" for t, p in
                                  zip(lt[i][lt[i] >= 0], lp[i][lt[i] >= 0]))
                right = "\t".join(f"{t},{p}" for t, p in
                                   zip(rt[i][rt[i] >= 0],
                                       rp[i][rt[i] >= 0]))
                if left or right:
                    orphan_fh.write(f"{left}:{right}\n")
        if unmapped_fh is not None or sam_fh is not None:
            names = (chunk.left.names if paired else chunk.names) or []
            ok = (to_np(out["frag_ok"]) if multiproc
                  else np.asarray(out["frag_ok"]))
            if unmapped_fh is not None:
                for i, nm in enumerate(names[:chunk.n_valid]):
                    if not ok[i]:
                        nm_s = nm.decode() if isinstance(nm, bytes) else nm
                        unmapped_fh.write(f"{nm_s} u\n")
            if sam_fh is not None:
                out_s = out
                if multiproc:
                    out_s = {k: (to_np(out[k]) if k in (
                        "frag_ok", "best_txp", "best_pos", "best_fw",
                        "best_flen", "best_is_paired") else out[k])
                        for k in out}
                _write_sam_batch(sam_fh, index, names, chunk, out_s,
                                 paired)
        if totals["num_processed"] >= opts.num_burnin_frags:
            fld.freeze()
        n_batches += 1
        # live progress (--disableLiveProgress / --progressUpdateMs)
        if (progress and not getattr(opts, "disable_live_progress", False)
                and time.time() - _last_progress[0]
                >= getattr(opts, "progress_update_ms", 500) / 1000.0):
            _last_progress[0] = time.time()
            el = time.time() - t0
            logger.info(
                "processed %d fragments (%.0f frags/s), mapped %.2f%%",
                totals["num_processed"],
                totals["num_processed"] / max(el, 1e-9),
                100.0 * totals["num_mapped"]
                / max(totals["num_processed"], 1))

    if multiproc:
        from salmon_tpu.io.fastq import (PairedChunk, ReadChunk,
                                         bucket_len)
        _Lfix = bucket_len(opts.max_read_len, opts.max_read_len)
        _B = opts.reads_per_batch

        def _empty_chunk():
            codes = np.full((_B, _Lfix), 4, np.uint8)
            lens = np.zeros(_B, np.int32)
            names = [] if want_names else None
            if paired:
                return PairedChunk(ReadChunk(codes, lens, 0, names),
                                   ReadChunk(codes.copy(), lens.copy(),
                                             0))
            return ReadChunk(codes, lens, 0, names)

        if file_assign:
            # per-process file streams end at different times: agree on
            # super-batch count with a tiny has-data allgather, padding
            # finished processes
            def my_chunks(it):
                from jax.experimental import multihost_utils
                it = iter(it)
                while True:
                    c = next(it, None)
                    flags = multihost_utils.process_allgather(
                        np.array([0 if c is None else 1], np.int32))
                    if int(np.asarray(flags).sum()) == 0:
                        return
                    yield c if c is not None else _empty_chunk()
        else:
            # shared file: each process maps the pid-th chunk of every
            # nproc-chunk group; missing tail chunks become padding
            def my_chunks(it):
                group = []
                for c in it:
                    group.append(c)
                    if len(group) == nproc:
                        yield group[pid]
                        group = []
                if group:
                    yield (group[pid] if pid < len(group)
                           else _empty_chunk())
        chunks = my_chunks(chunks)

    # --profileDir: device profiler trace over the mapping loop (the
    # tracing/progress aux subsystem, SURVEY §5; open with xprof)
    profile_dir = getattr(opts, "profile_dir", None)
    if profile_dir:
        import jax.profiler as _prof
        os.makedirs(profile_dir, exist_ok=True)
        _prof.start_trace(profile_dir)
        logger.info("profiler trace -> %s", profile_dir)

    # K-deep host/device pipeline: consume batch N-K while N computes.
    # Depth 1 (default) = the reference's one-batch-stale online state;
    # deeper pipelines (opts.pipeline_depth / SALMON_TPU_PIPE_DEPTH)
    # hide more host time behind device time at the cost of K-batch
    # staleness in the FLD/online mass fed forward (benign — the
    # reference's racing threads have the same property)
    import collections as _coll
    depth = max(1, int(os.environ.get(
        "SALMON_TPU_PIPE_DEPTH", getattr(opts, "pipeline_depth", 1))))
    pending = _coll.deque()
    _last_progress = [time.time()]
    for chunk in chunks:
        batch, out = submit(chunk)

        if resolved_format is None:
            # detection batches run synchronously: accumulate observed
            # formats until the detector has enough samples (reference
            # LibraryTypeDetector: 50k samples, neutral compat until
            # then), then switch the expected format mid-stream
            detect_hist += np.asarray(out["fmt_hist"], dtype=np.int64)
            if detect_hist.sum() >= DETECT_SAMPLES_NEEDED:
                resolved_format = _detect_library_format(detect_hist,
                                                         paired)
                logger.info("auto-detected library format: %s",
                            resolved_format)
                expected = libformat.parse_library_format(resolved_format)
                cp, co, cs = compat_arrays(expected)

        pending.append((chunk, batch, out))
        if len(pending) > depth:
            _consume(*pending.popleft())
    while pending:
        _consume(*pending.popleft())
    if profile_dir:
        import jax.profiler as _prof
        _prof.stop_trace()
    if auto_detect and resolved_format is None:
        # input ended before 50k samples: guess from what we saw
        resolved_format = _detect_library_format(detect_hist, paired)
        logger.info("auto-detected library format (short input): %s",
                    resolved_format)

    if unmapped_fh is not None:
        unmapped_fh.close()
    if orphan_fh is not None:
        orphan_fh.close()
    if sam_fh is not None and sam_path != "-":
        sam_fh.close()
    map_seconds = time.time() - t0
    if totals["seed_tail_over"]:
        logger.warning(
            "seed tail-gather budget saturated for %d k-mer windows "
            "(their occurrences past the first oct row were dropped); "
            "this index is unusually repeat-heavy for the budget — see "
            "mapping.score.expand_occurrences tail_frac",
            totals["seed_tail_over"])
    if totals["num_mapped"] < opts.min_assigned_frags:
        raise InsufficientAssignedFragments(
            f"salmon_tpu was only able to assign {totals['num_mapped']} "
            f"fragments (min required: {opts.min_assigned_frags})")

    if multiproc and bias_state is not None:
        # merge per-process observed-bias histograms (mergeObservedBias,
        # WorkerRuntimeContext.hpp:22-70): fixed-size and additive by
        # construction, so a single allreduce makes every process's
        # BiasObservations identical
        o = bias_state.obs
        (o.obs5, o.obs3, o.gc_obs, o.pos5, o.pos3, mf, mr) = \
            _dist.allreduce_histograms(
                [o.obs5, o.obs3, o.gc_obs, o.pos5, o.pos3,
                 np.float64(o.mass_fwd), np.float64(o.mass_rc)])
        o.mass_fwd, o.mass_rc = float(mf), float(mr)
    if multiproc:
        # merge eq tables across hosts: every process ends with the
        # identical table, so the replicated EM agrees everywhere
        from salmon_tpu.inference.eqclasses import _dedupe_rows
        acc._collapse()
        if acc._chunks:
            keys, cts, ws = acc._chunks[0]
        else:
            keys = np.zeros((0, 0), np.int32)
            cts = np.zeros(0)
            ws = np.zeros((0, 0))
        k2, c2, w2 = _dist.allgather_eq_state(keys, cts, ws)
        if k2.size:
            acc._chunks = [_dedupe_rows(k2, c2, w2)]
            acc._ncols = k2.shape[1]
            acc._t2 = acc._t2 or cfg.max_pair_cands
            acc._buffered = acc._chunks[0][0].shape[0]
    eq = acc.finish()
    if getattr(opts, "no_rich_eq_classes", False) \
            and eq.labels.shape[0]:
        # --noRichEqClasses (also implied by --meta): flat aux weights
        # 1/|label| instead of the accumulated conditional probabilities
        # (reference noRichEqClasses, SalmonQuantify.cpp:328)
        sz = np.repeat(eq.class_sizes.astype(np.float64),
                       eq.class_sizes)
        eq = dataclasses.replace(eq, weights=1.0 / np.maximum(sz, 1.0))
    # decoys never enter eq classes (filtered on device), but keep shapes for
    # valid targets only in the EM (reference dropDecoyTranscripts)
    n_valid = index.num_valid_targets
    # single-end keeps the prior FLD (no paired observations), which the
    # reference likewise uses for its length correction
    fld_pmf = fld.pmf()
    eff = effective_lengths(
        index.lengths[:n_valid], fld_pmf,
        no_length_correction=opts.no_length_correction,
        no_effective_length_correction=opts.no_effective_length_correction)

    emc = em_mod.EMConfig(
        use_vbem=opts.use_vb_opt and not opts.use_em,
        vb_prior=opts.vb_prior,
        per_transcript_prior=opts.per_transcript_prior,
        rel_diff_tolerance=opts.relative_diff_tolerance,
        max_iterations=opts.max_em_iterations,
        # reference: minIter 100 when bias-correcting, else 50
        # (CollapsedEMOptimizer.cpp:741-742)
        min_iterations=(opts.min_required_iterations
                        if (opts.seq_bias_correct or opts.gc_bias_correct
                            or opts.pos_bias_correct)
                        else opts.min_em_iterations))
    # normalizeAlphas (reference SalmonUtils.cpp:462-529): distribute
    # each multimap-connected cluster's fragment count over its members
    # proportionally to online mass, projected into [unique, total]
    # counts (ClusterForest + projectToPolytope; inference/clusters.py)
    if eq.num_classes and online_mass[:n_valid].sum() > 0:
        from salmon_tpu.inference import clusters as clusters_mod
        online_mass = clusters_mod.normalize_alphas(
            eq, n_valid, online_mass[:n_valid])
    else:
        om_sum = online_mass[:n_valid].sum()
        if om_sum > 0:
            online_mass = online_mass * (totals["num_mapped"] / om_sum)

    t_em = time.time()
    if opts.skip_quant:
        # --skipQuant (reference MappingPipelineStages.cpp:45): no
        # optimizer; eq classes/aux outputs only
        res = {"alphas": np.zeros(n_valid), "iterations": 0,
               "max_rel_diff": 0.0, "converged": False,
               "skipped": True}
    else:
        res = em_mod.optimize(eq, n_valid, eff,
                              online_mass=online_mass[:n_valid],
                              total_mapped=float(totals["num_mapped"]),
                              config=emc, init_uniform=opts.init_uniform,
                              num_required_frags=getattr(
                                  opts, "num_required_frags", 5e7),
                              alt_init=getattr(
                                  opts, "alternative_init_mode", False)
                              or getattr(opts, "meta_mode", False))
    if bias_state is not None and bias_state.enabled \
            and not opts.skip_quant:
        # bias-aware effective-length recompute + re-optimize (reference:
        # the mid-loop needsBiasLengthRecompute step,
        # CollapsedEMOptimizer.cpp:900-928)
        logger.info("recomputing effective lengths with bias models")
        eff2 = bias_state.corrected_effective_lengths(
            res["alphas"], eff, fld_pmf)
        if not np.allclose(eff2, eff):
            eff = eff2
            res = em_mod.optimize(
                eq, n_valid, eff, online_mass=online_mass[:n_valid],
                total_mapped=float(totals["num_mapped"]), config=emc,
                init_uniform=opts.init_uniform,
                num_required_frags=getattr(opts, "num_required_frags",
                                           5e7),
                alt_init=getattr(opts, "alternative_init_mode", False)
                or getattr(opts, "meta_mode", False))
    em_seconds = time.time() - t_em
    res["map_seconds"] = map_seconds
    res["em_seconds"] = em_seconds
    res["em_iters_per_s"] = res["iterations"] / max(em_seconds, 1e-9)

    counts = res["alphas"]
    tpm = writers.compute_tpm(counts, eff)
    fmt_counts = {nm: int(fmt_hist_total[i]) for i, nm in
                  enumerate(libformat.format_names_paired())} if paired \
        else {nm: int(fmt_hist_total[i]) for i, nm in
              enumerate(libformat.format_names_single())}
    return QuantResult(
        names=index.names[:n_valid], counts=counts, eff_lens=eff, tpm=tpm,
        num_processed=totals["num_processed"],
        num_mapped=totals["num_mapped"],
        num_paired=totals["num_paired"],
        num_orphans=totals["num_orphans"],
        num_orphans_rescued=totals["num_orphans_rescued"],
        em_info=res, fmt_counts=fmt_counts, eq_classes=eq, fld=fld,
        lib_format=resolved_format or lib_format, bias=bias_state,
        mapping_stats={k: totals[k] for k in (
            "num_decoy_fragments", "num_dovetail_fragments",
            "num_frags_filtered_vm", "num_alns_below_threshold")})


def _posterior_samples(result: QuantResult, opts: SalmonDefaults,
                       seed: int):
    """Gibbs or bootstrap draws (reference: stageFinalizeMappingOutputs
    :63-98). Returns (samples, samp_type) or (None, 'none')."""
    from salmon_tpu.inference import sampling

    n = len(result.names)
    if opts.num_gibbs_samples > 0:
        # Gibbs prior floors (reference CollapsedGibbsSampler::sample
        # :356-368)
        use_vb = opts.use_vb_opt and not opts.use_em
        if use_vb:
            prior = max(opts.vb_prior, 1.0) if opts.per_transcript_prior \
                else max(opts.vb_prior, 1e-3)
        else:
            prior = 1e-3
        if not opts.per_transcript_prior:
            prior = prior * np.maximum(result.eff_lens, 1.0)
        gibbs_fn = (sampling.gibbs_samples_routed
                    if result.eq_classes.labels.shape[0]
                    >= em_mod.ROUTED_MIN_ENTRIES
                    else sampling.gibbs_samples)
        samples = gibbs_fn(
            result.eq_classes, n, result.eff_lens, result.counts,
            opts.num_gibbs_samples, thinning=opts.thinning_factor,
            prior=prior, no_gamma_draw=opts.no_gamma_draw, seed=seed)
        return samples, "gibbs"
    if opts.num_bootstraps > 0:
        # at scale the sort-routed engine packs once and runs all
        # replicates as one vmapped chunked program
        boot_fn = (sampling.bootstrap_samples_routed
                   if result.eq_classes.labels.shape[0]
                   >= em_mod.ROUTED_MIN_ENTRIES
                   else sampling.bootstrap_samples)
        samples = boot_fn(
            result.eq_classes, n, result.eff_lens, opts.num_bootstraps,
            use_vbem=opts.use_vb_opt and not opts.use_em,
            vb_prior=opts.vb_prior,
            per_transcript_prior=opts.per_transcript_prior,
            reproject=opts.bootstrap_reproject, seed=seed)
        return samples, "bootstrap"
    return None, "none"


def write_outputs(result: QuantResult, index: TranscriptomeIndex,
                  out_dir: str, opts: SalmonDefaults = DEFAULTS,
                  cmd_args: Optional[dict] = None,
                  dump_eq: bool = False, dump_eq_weights: bool = True,
                  seed: int = 271828,
                  mapping_type: str = "mapping") -> None:
    """Write the full output directory (reference:
    stageFinalizeMappingOutputs, MappingPipelineStages.cpp:37-203)."""
    n_valid = index.num_valid_targets
    if not getattr(opts, "skip_quant", False):
        writers.write_quant_sf(out_dir, result.names,
                               index.complete_lengths[:n_valid],
                               result.eff_lens, result.counts,
                               sig_digits=opts.sig_digits)
    writers.write_cmd_info(out_dir, cmd_args or {})
    aux_ids = getattr(opts, "_aux_target_ids", None)
    if aux_ids is not None:
        import json as _json
        os_mod = __import__("os")
        d = os_mod.path.join(out_dir,
                             getattr(opts, "aux_dir", "aux_info"))
        os_mod.makedirs(d, exist_ok=True)
        with open(os_mod.path.join(d, "aux_target_ids.json"), "w") as fh:
            _json.dump({"aux_target_ids": aux_ids}, fh)
    # numCompat: observed formats compatible with the expected one
    # (reference ReadLibrary::numCompat via salmon::utils::compatibleHit)
    try:
        fmt = libformat.parse_library_format(result.lib_format)
        compat = libformat.paired_compat_table(fmt) \
            if set(result.fmt_counts) >= {"ISF", "ISR"} \
            else libformat.single_compat_table(fmt)
        names = (libformat.format_names_paired()
                 if set(result.fmt_counts) >= {"ISF", "ISR"}
                 else libformat.format_names_single())
        num_compat = sum(int(result.fmt_counts.get(nm, 0))
                         for i, nm in enumerate(names) if compat[i])
    except Exception:
        num_compat = result.num_mapped
    writers.write_lib_format_counts(
        out_dir, result.lib_format, result.fmt_counts, num_compat,
        result.num_processed, result.num_mapped)
    aux = getattr(opts, "aux_dir", "aux_info")
    samples, samp_type = (None, "none")
    if (result.eq_classes is not None and result.eq_classes.num_classes
            and not getattr(opts, "skip_quant", False)):
        samples, samp_type = _posterior_samples(result, opts, seed)
    if samples is not None:
        writers.write_bootstraps(out_dir, aux, result.names, samples)
    pm = (100.0 * result.num_mapped / result.num_processed
          if result.num_processed else 0.0)
    writers.write_meta_info(out_dir, aux, {
        "opt_type": "vb" if (opts.use_vb_opt and not opts.use_em) else "em",
        "samp_type": samp_type,
        "num_bootstraps": (opts.num_gibbs_samples
                           if samp_type == "gibbs"
                           else opts.num_bootstraps),
        "num_libraries": 1,
        "library_types": [result.lib_format],
        "frag_dist_length": opts.max_frag_length + 1,
        "seq_bias_correct": opts.seq_bias_correct,
        "gc_bias_correct": opts.gc_bias_correct,
        "pos_bias_correct": opts.pos_bias_correct,
        # which positional estimator ran: "reference-parity" reproduces
        # the reference algorithm exactly (incl. its two root-caused
        # defects: fw x rc double count + uniform-bin/Cufflinks-knot
        # warp — evidence: scripts/posbias_reference_trace.py, gain
        # −76%/−32% under oracle generative positional bias);
        # "corrected" (--posBiasCorrected) removes both (gain positive)
        "pos_bias_mode": (
            "corrected" if getattr(opts, "pos_bias_corrected", False)
            else "reference-parity") if opts.pos_bias_correct else "off",
        "num_bias_bins": 4096,
        "mapping_type": mapping_type,
        "keep_duplicates": index.info.get("keep_duplicates", True),
        "num_valid_targets": n_valid,
        "num_decoy_targets": index.num_targets - n_valid,
        "num_eq_classes": result.eq_classes.num_classes
        if result.eq_classes is not None else 0,
        "serialized_eq_classes": dump_eq,
        "eq_class_properties": ["range_factorized"]
        if opts.range_factorization_bins > 0 else [],
        "length_classes": [],
        "index_seq_hash": index.info.get("SeqHash256", ""),
        "index_name_hash": index.info.get("NameHash256", ""),
        "index_seq_hash512": index.info.get("SeqHash512", ""),
        "index_name_hash512": index.info.get("NameHash512", ""),
        "index_decoy_seq_hash": index.info.get("DecoySeqHash", ""),
        "index_decoy_name_hash": index.info.get("DecoyNameHash", ""),
        "num_targets": index.num_targets,
        "num_processed": result.num_processed,
        "num_mapped": result.num_mapped,
        "num_orphans_rescued": result.num_orphans_rescued,
        "num_decoy_fragments":
        result.mapping_stats.get("num_decoy_fragments", 0),
        "num_dovetail_fragments":
        result.mapping_stats.get("num_dovetail_fragments", 0),
        "num_fragments_filtered_vm":
        result.mapping_stats.get("num_frags_filtered_vm", 0),
        "num_alignments_below_threshold_for_mapped_fragments_vm":
        result.mapping_stats.get("num_alns_below_threshold", 0),
        "percent_mapped": pm,
        "call": "quant",
        "num_em_iterations": result.em_info.get("iterations", 0),
        "em_converged": result.em_info.get("converged", False),
        # reference meta keys (GZipWriter.cpp:527-529)
        "frag_length_mean": (result.fld.summary()["mean"]
                             if result.fld else 0.0),
        "frag_length_sd": (result.fld.summary()["sd"]
                           if result.fld else 0.0),
    })
    if result.fld is not None:
        writers.write_fld(out_dir, aux, result.fld.pmf(),
                          seed=getattr(opts, "seed", 271828))
    writers.write_vestigial_bias_vectors(out_dir, aux)
    if result.bias is not None and result.bias.enabled:
        writers.write_bias_models(out_dir, aux, result.bias, opts)
    if result.eq_classes is not None:
        writers.write_ambig_info(out_dir, aux, n_valid, result.eq_classes)
        if dump_eq:
            writers.write_eq_classes(out_dir, aux, result.names,
                                     result.eq_classes,
                                     dump_weights=dump_eq_weights,
                                     eff_lens=result.eff_lens)
