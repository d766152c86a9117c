"""Host-side index construction (reference analog: `salmon index` —
src/index/BuildSalmonIndex.cpp + external pufferfish fixFasta/TwoPaCo/SSHash;
see SURVEY.md §2.3/§3.1).

Instead of a compacted de Bruijn graph + MPHF, the TPU index is:
  canonical k-mer -> CSR occurrence list of (transcript, position, orient)
with a bounded-probe hash table for device lookup. This trades some memory
for a branch-free gather-only query path (the property the TPU needs).

Decoy sequences (reference: --decoys / firstDecoyIndex semantics,
ReadExperiment.inl:156-158) are appended after valid targets and share the
same table; mapping-time decoy logic keys off txp_id >= first_decoy_index.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger("salmon_tpu")

from salmon_tpu.constants import DEFAULTS
from salmon_tpu.index.hashtable import (KmerHashTable, build_hash_table,
                                        SLOTS_PER_BUCKET as
                                        HT_SLOTS_PER_BUCKET)
from salmon_tpu.io.fasta import load_transcripts
from salmon_tpu.utils.dna import canonical_kmers, kmers_of

INDEX_FORMAT_VERSION = 4  # v4: 4-slot (n_buckets, 8) rows; v3 was 8-slot 16-wide


@dataclasses.dataclass
class TranscriptomeIndex:
    """The full on-host index; device planes are materialized by the mapper."""
    k: int
    names: list
    lengths: np.ndarray           # (T,) int32 post-polyA-clip lengths
    complete_lengths: np.ndarray  # (T,) int32 original lengths
    first_decoy_index: int        # T_valid; decoys occupy [T_valid, T)
    # unique canonical k-mers, sorted ascending (uint64)
    kmers: np.ndarray
    # CSR over unique k-mers
    occ_offsets: np.ndarray       # (n_kmers + 1,) int64
    occ_txp: np.ndarray           # (n_occs,) int32
    occ_pos: np.ndarray           # (n_occs,) int32
    occ_fwd: np.ndarray           # (n_occs,) bool — txp k-mer equals canonical
    table: KmerHashTable
    # 2-bit-packed transcript sequences, concatenated (for DP extension / GC)
    seq_codes: np.ndarray         # (total_len,) uint8 codes
    seq_offsets: np.ndarray       # (T + 1,) int64
    info: dict

    @property
    def num_targets(self) -> int:
        return len(self.names)

    @property
    def num_valid_targets(self) -> int:
        return self.first_decoy_index

    def transcript_codes(self, i: int) -> np.ndarray:
        return self.seq_codes[self.seq_offsets[i]:self.seq_offsets[i + 1]]


PARTITIONED_BUILD_BASES = 1_500_000_000   # switch to the partitioned build
TABLE_DIRECT_MAX_KEYS = 800_000_000       # past this, tables are per-shard


def build_index(
    transcripts_path: str,
    k: int = DEFAULTS.kmer_len,
    decoys_path: Optional[str] = None,
    decoy_names_path: Optional[str] = None,
    gencode: bool = False,
    keep_duplicates: bool = True,
    noclip_polya: bool = False,
    partition_bits: Optional[int] = None,
) -> TranscriptomeIndex:
    """Build the index from a transcript FASTA (+ optional decoy FASTA).

    Reference CLI contract: k odd and <= 31 (BuildSalmonIndex.cpp:70-100).
    `decoy_names_path` mimics `-d decoys.txt` with a combined FASTA: names
    listed there are treated as decoys (they must come last).

    Genome-decoy scale (BASELINE config 5, 3Gb+ concatenated input): the
    enumeration runs per canonical-top-bits partition (`partition_bits`,
    auto-enabled past PARTITIONED_BUILD_BASES) so peak sort-buffer memory
    stays ~1/2^bits of the flat path, and past TABLE_DIRECT_MAX_KEYS no
    monolithic hash table is built — such indexes must be quantified
    with --indexShards, which builds self-contained per-shard tables.
    """
    if k % 2 == 0 or k > 31 or k < 5:
        raise ValueError(f"k must be odd and in [5, 31], got {k}")

    records, info = load_transcripts(
        transcripts_path, gencode=gencode, keep_duplicates=keep_duplicates,
        noclip_polya=noclip_polya)
    decoy_names: set = set()
    if decoy_names_path:
        with open(decoy_names_path) as fh:
            decoy_names = {ln.strip() for ln in fh if ln.strip()}
    # order: valid targets first, then decoys (reference firstDecoyIndex)
    valid = [r for r in records if r.name not in decoy_names]
    decoy = [r for r in records if r.name in decoy_names]
    if decoys_path:
        drecs, dinfo = load_transcripts(decoys_path, gencode=gencode,
                                        noclip_polya=noclip_polya)
        decoy.extend(drecs)
        info["DecoySeqHash"] = dinfo["SeqHash"]
        info["DecoyNameHash"] = dinfo["NameHash"]
    records = valid + decoy
    first_decoy_index = len(valid)

    names = [r.name for r in records]
    lengths = np.array([r.seq_codes.shape[0] for r in records],
                       dtype=np.int32)
    complete_lengths = np.array([r.complete_length for r in records],
                                dtype=np.int32)

    seq_offsets = np.zeros(len(records) + 1, dtype=np.int64)
    seq_offsets[1:] = np.cumsum(lengths.astype(np.int64))
    seq_codes = (np.concatenate([r.seq_codes for r in records])
                 if records else np.zeros(0, dtype=np.uint8))

    # --- enumerate (canonical kmer, txp, pos, fwd), sorted by k-mer ------
    # native path: OpenMP enumeration + parallel radix sort
    # (native/kmersort.cpp); the pure-numpy fallback is the same
    # computation with a single-threaded stable argsort.
    from salmon_tpu.index import native_kmers
    total_bases = int(seq_offsets[-1])
    if partition_bits is None:
        partition_bits = 6 if total_bases >= PARTITIONED_BUILD_BASES \
            else 0
    if partition_bits and native_kmers.available():
        return _build_partitioned(records, info, k, first_decoy_index,
                                  seq_codes, seq_offsets, partition_bits,
                                  keep_duplicates)
    native = native_kmers.enumerate_sorted(seq_codes, seq_offsets, k)
    if native is not None:
        km, tx, po, fw = native
    else:
        all_kmers, all_txp, all_pos, all_fwd = [], [], [], []
        for tid, rec in enumerate(records):
            kms, valid_mask = kmers_of(rec.seq_codes, k)
            if kms.shape[0] == 0:
                continue
            canon, fwd = canonical_kmers(kms, k)
            canon = canon[valid_mask]
            fwd = fwd[valid_mask]
            pos = np.nonzero(valid_mask)[0].astype(np.int32)
            all_kmers.append(canon)
            all_txp.append(np.full(canon.shape[0], tid, dtype=np.int32))
            all_pos.append(pos)
            all_fwd.append(fwd)

        if all_kmers:
            km = np.concatenate(all_kmers)
            tx = np.concatenate(all_txp)
            po = np.concatenate(all_pos)
            fw = np.concatenate(all_fwd)
        else:
            km = np.zeros(0, dtype=np.uint64)
            tx = po = np.zeros(0, dtype=np.int32)
            fw = np.zeros(0, dtype=bool)

        # stable sort keeps (txp,pos) order within a k-mer
        order = np.argsort(km, kind="stable")
        km, tx, po, fw = km[order], tx[order], po[order], fw[order]
    uniq, starts = np.unique(km, return_index=True)
    offsets = np.concatenate([starts.astype(np.int64),
                              np.array([km.shape[0]], dtype=np.int64)])

    table = build_hash_table(uniq, occ_offsets=offsets)
    if table.n_shadowed:
        # fingerprint-shadow merge blocks: append the merged slots'
        # occurrence records + separators past the CSR (hashtable doc)
        from salmon_tpu.index.hashtable import appendix_plan
        is_sep, gi, sep_fp = appendix_plan(table)
        tx = np.concatenate([tx, np.where(is_sep, -1, tx[gi])
                             .astype(np.int32)])
        po = np.concatenate([po, np.where(is_sep, sep_fp, po[gi])
                             .astype(np.int32)])
        fw = np.concatenate([fw, np.where(is_sep, False, fw[gi])])

    info.update({
        "index_format_version": INDEX_FORMAT_VERSION,
        "k": k,
        "num_targets": len(records),
        "num_decoys": len(records) - first_decoy_index,
        "num_kmers": int(uniq.shape[0]),
        "num_occurrences": int(tx.shape[0]),  # incl. shadow-merge appendix
        "keep_duplicates": keep_duplicates,
    })
    return TranscriptomeIndex(
        k=k, names=names, lengths=lengths,
        complete_lengths=complete_lengths,
        first_decoy_index=first_decoy_index,
        kmers=uniq, occ_offsets=offsets, occ_txp=tx, occ_pos=po, occ_fwd=fw,
        table=table, seq_codes=seq_codes, seq_offsets=seq_offsets, info=info)


_INDEX_ARRAYS = ("lengths", "complete_lengths", "kmers", "occ_offsets",
                 "occ_txp", "occ_pos", "occ_fwd", "table_rows",
                 "seq_codes", "seq_offsets")


def _build_partitioned(records, info, k, first_decoy_index, seq_codes,
                       seq_offsets, partition_bits,
                       keep_duplicates) -> TranscriptomeIndex:
    """Memory-bounded build: per canonical-top-bits partition, enumerate
    + sort + extract unique keys, writing into buffers preallocated at
    the (cheaply pre-counted) total record count. Output is bit-identical
    to the flat path; only peak memory differs (partition-sized sort
    scratch instead of whole-input buffers)."""
    from salmon_tpu.index import native_kmers

    names = [r.name for r in records]
    lengths = np.array([r.seq_codes.shape[0] for r in records], np.int32)
    complete_lengths = np.array([r.complete_length for r in records],
                                np.int32)
    total = native_kmers.count_total(seq_codes, seq_offsets, k)
    logger.info("partitioned index build: %d records over %d partitions",
                total, 1 << partition_bits)
    tx = np.empty(total, np.int32)
    po = np.empty(total, np.int32)
    fw = np.empty(total, bool)
    # unique-key buffers at the record-count upper bound (~6% slack at
    # transcriptome scale); trimmed by view at the end
    uniq_buf = np.empty(total, np.uint64)
    off_buf = np.empty(total + 1, np.int64)
    base = 0
    nu = 0
    for out in native_kmers.enumerate_sorted_partitioned(
            seq_codes, seq_offsets, k, partition_bits):
        if out is None:
            raise RuntimeError("native library required for the "
                               "partitioned build")
        kmp, txp_, pop_, fwp_ = out
        n = kmp.shape[0]
        if not n:
            continue
        tx[base:base + n] = txp_
        po[base:base + n] = pop_
        fw[base:base + n] = fwp_
        up, sp = np.unique(kmp, return_index=True)
        m = up.shape[0]
        uniq_buf[nu:nu + m] = up
        off_buf[nu:nu + m] = sp.astype(np.int64) + base
        nu += m
        base += n
    off_buf[nu] = total
    uniq = uniq_buf[:nu]
    offsets = off_buf[:nu + 1]

    if nu <= TABLE_DIRECT_MAX_KEYS:
        table = build_hash_table(uniq, occ_offsets=offsets)
        if table.n_shadowed:
            from salmon_tpu.index.hashtable import appendix_plan
            is_sep, gi, sep_fp = appendix_plan(table)
            tx = np.concatenate([tx, np.where(is_sep, -1, tx[gi])
                                 .astype(np.int32)])
            po = np.concatenate([po, np.where(is_sep, sep_fp, po[gi])
                                 .astype(np.int32)])
            fw = np.concatenate([fw, np.where(is_sep, False, fw[gi])])
    else:
        table = None
        info["requires_shards"] = True
        logger.info("index has %d keys: skipping the monolithic table "
                    "(quantify with --indexShards; per-shard tables are "
                    "built at load)", nu)

    info.update({
        "index_format_version": INDEX_FORMAT_VERSION,
        "k": k,
        "num_targets": len(records),
        "num_decoys": len(records) - first_decoy_index,
        "num_kmers": int(nu),
        "num_occurrences": int(tx.shape[0]),  # incl. shadow-merge appendix
        "keep_duplicates": keep_duplicates,
    })
    return TranscriptomeIndex(
        k=k, names=names, lengths=lengths,
        complete_lengths=complete_lengths,
        first_decoy_index=first_decoy_index,
        kmers=uniq, occ_offsets=offsets, occ_txp=tx, occ_pos=po,
        occ_fwd=fw, table=table, seq_codes=seq_codes,
        seq_offsets=seq_offsets, info=info)


def save_index(idx: TranscriptomeIndex, out_dir: str) -> None:
    """One raw .npy per array: multi-GB members load with mmap_mode='r'
    (lazy page-in; arrays the caller never touches are never read),
    where a .npz member access always costs a full eager copy. zlib
    compression is skipped outright — it costs tens of minutes
    single-threaded on the occurrence arrays."""
    os.makedirs(out_dir, exist_ok=True)
    arrays = {
        "lengths": idx.lengths, "complete_lengths": idx.complete_lengths,
        "kmers": idx.kmers, "occ_offsets": idx.occ_offsets,
        "occ_txp": idx.occ_txp, "occ_pos": idx.occ_pos,
        "occ_fwd": idx.occ_fwd,
        "table_rows": (idx.table.rows if idx.table is not None
                       else np.zeros((0, 8), np.int32)),
        "seq_codes": idx.seq_codes, "seq_offsets": idx.seq_offsets}
    for name in _INDEX_ARRAYS:
        np.save(os.path.join(out_dir, f"{name}.npy"), arrays[name])
    meta = dict(idx.info)
    meta.update({
        "k": idx.k,
        "first_decoy_index": idx.first_decoy_index,
        "table_n_slots": (idx.table.n_slots if idx.table is not None
                          else 0),
        "table_max_probes": (idx.table.max_probes
                             if idx.table is not None else 0),
    })
    with open(os.path.join(out_dir, "info.json"), "w") as fh:
        json.dump(meta, fh, indent=2, default=str)
    with open(os.path.join(out_dir, "ref_names.txt"), "w") as fh:
        fh.write("\n".join(idx.names) + ("\n" if idx.names else ""))


def load_index(index_dir: str) -> TranscriptomeIndex:
    with open(os.path.join(index_dir, "info.json")) as fh:
        meta = json.load(fh)
    if meta.get("index_format_version") != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"index at {index_dir} has format version "
            f"{meta.get('index_format_version')}, expected "
            f"{INDEX_FORMAT_VERSION}; please rebuild")
    with open(os.path.join(index_dir, "ref_names.txt")) as fh:
        names = [ln.rstrip("\n") for ln in fh if ln.rstrip("\n")]
    # one raw .npy per array: mmap so untouched arrays never hit disk
    z = {name: np.load(os.path.join(index_dir, f"{name}.npy"),
                       mmap_mode="r")
         for name in _INDEX_ARRAYS}
    table = None
    if int(meta.get("table_n_slots", 0)):
        n_slots = int(meta["table_n_slots"])
        want = (n_slots // HT_SLOTS_PER_BUCKET, 2 * HT_SLOTS_PER_BUCKET)
        if tuple(z["table_rows"].shape) != want:
            raise ValueError(
                f"index at {index_dir}: table_rows shape "
                f"{tuple(z['table_rows'].shape)} does not match the "
                f"{HT_SLOTS_PER_BUCKET}-slot bucket geometry {want}; "
                f"please rebuild")
        table = KmerHashTable(
            rows=z["table_rows"], n_slots=n_slots,
            max_probes=int(meta["table_max_probes"]))
    return TranscriptomeIndex(
        k=int(meta["k"]), names=names, lengths=z["lengths"],
        complete_lengths=z["complete_lengths"],
        first_decoy_index=int(meta["first_decoy_index"]),
        kmers=z["kmers"], occ_offsets=z["occ_offsets"],
        occ_txp=z["occ_txp"], occ_pos=z["occ_pos"], occ_fwd=z["occ_fwd"],
        table=table, seq_codes=z["seq_codes"], seq_offsets=z["seq_offsets"],
        info=meta)
