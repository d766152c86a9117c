"""K-mer-range sharding of the occurrence index across mesh devices.

At genome-decoy scale (BASELINE config 5: human gencode + GRCh38 decoy,
~3.4 Gb of concatenated sequence) the occurrence CSR is ~3.2G records
(~26 GB quad-packed) and the bucket table another ~2^31 slots — far past
one chip's HBM. The reference sidesteps this with host RAM (pufferfish
index mmap); the TPU-native answer is to SHARD the dictionary over the
mesh:

  * every unique canonical k-mer has one OWNER shard, chosen by the top
    bits of its second bucket hash (mix32b — independent of the low
    bits both bucket indices use);
  * each shard holds a complete two-choice bucket table over its own
    keys (common slot count so the stacked tables tile a mesh axis) and
    a contiguous local slice of the occurrence CSR; slot payloads point
    into the LOCAL slice, while the records themselves keep global
    (transcript, position, orientation) coordinates;
  * at query time each device probes only its shard (non-owned queries
    are masked not-found), expands its occurrences into the flat
    budgeted hit list of the sparse seed flow, and the per-shard hit
    lists are all-gathered over the mesh's "kmer" axis before co-linear
    ranking (mapping.seed_sparse.collect_hits_sparse / rank_hits).

Reference analog: the single shared pufferfish index queried by N
threads (SURVEY.md §2.11); the sharding itself has no reference
counterpart — it is what lets the index scale past one device's memory.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from salmon_tpu.index.builder import TranscriptomeIndex
from salmon_tpu.index.hashtable import (appendix_plan, build_hash_table,
                                        mix32b, split_u64, table_n_slots)


def shard_owner(hi: np.ndarray, lo: np.ndarray, shard_bits: int):
    """Owner shard of each key: top `shard_bits` bits of the second
    bucket mix (the bucket indices use its LOW bits, so owner and
    in-shard placement stay independent). Must match the device twin in
    parallel.sharded."""
    if shard_bits == 0:
        return np.zeros(np.shape(hi), np.uint32)
    return mix32b(hi, lo) >> np.uint32(32 - shard_bits)


@dataclasses.dataclass
class ShardedIndexArrays:
    """Stacked per-shard device planes (leading axis = shard)."""
    n_shards: int
    shard_bits: int
    n_slots: int                 # per-shard table slots (common)
    tab_rows: np.ndarray         # (S, n_buckets, 8) int32 (4-slot rows)
    occ_oct: np.ndarray          # (S, n_oct, 16) int32
    n_evicted: int


def shard_index_arrays(idx: TranscriptomeIndex,
                       n_shards: int) -> ShardedIndexArrays:
    """Partition the index's dictionary + occurrence CSR into
    `n_shards` self-contained shards (power of two)."""
    if n_shards & (n_shards - 1):
        raise ValueError(f"n_shards must be a power of two, got {n_shards}")
    shard_bits = int(n_shards).bit_length() - 1
    hi, lo = split_u64(idx.kmers)
    owner = shard_owner(hi, lo, shard_bits).astype(np.int64)
    counts = np.asarray(idx.occ_counts)   # NOT diff(offsets): the CSR
    # may carry oct-alignment pads between keys (diskfmt.oct_align_csr)
    pop = np.bincount(owner, minlength=n_shards)
    n_slots = table_n_slots(int(pop.max()) if pop.size else 1)

    occ_pf = np.asarray(idx.occ_pf)
    max_occ = 0
    tabs, occ_parts = [], []
    n_evicted = 0
    for s in range(n_shards):
        m = owner == s
        keys_s = idx.kmers[m]
        cnt_s = counts[m]
        off_s = np.zeros(cnt_s.shape[0] + 1, np.int64)
        np.cumsum(cnt_s, out=off_s[1:])
        total_s = int(off_s[-1])
        # contiguous local occ slice: global records gathered in shard
        # key order
        gidx = (np.repeat(idx.occ_offsets[:-1][m], cnt_s)
                + np.arange(total_s, dtype=np.int64)
                - np.repeat(off_s[:-1], cnt_s))
        txp_s, pf_s = idx.occ_txp[gidx], occ_pf[gidx]
        tab = build_hash_table(
            keys_s, occ_offsets=off_s, n_slots=n_slots,
            filter_counts=(idx.occ_true_counts[m]
                           if idx.occ_true_counts is not None else None),
            inline_records=(txp_s, pf_s))
        if tab.n_shadowed:
            # per-shard fingerprint-shadow merge blocks (hashtable doc)
            is_sep, gi, sep_fp = appendix_plan(tab)
            txp_s = np.concatenate(
                [txp_s, np.where(is_sep, -1, txp_s[gi]).astype(np.int32)])
            pf_s = np.concatenate(
                [pf_s, np.where(is_sep, sep_fp << 1, pf_s[gi])
                 .astype(np.int32)])
        occ_parts.append((txp_s, pf_s))
        n_evicted += tab.n_evicted
        tabs.append(tab)
        max_occ = max(max_occ, txp_s.shape[0])

    n_oct = max(-(-max_occ // 8), 1)
    occ_oct = np.zeros((n_shards, n_oct * 8, 2), np.int32)
    for s, (txp_s, pf_s) in enumerate(occ_parts):
        occ_oct[s, :txp_s.shape[0], 0] = txp_s
        occ_oct[s, :txp_s.shape[0], 1] = pf_s
    occ_oct = occ_oct.reshape(n_shards, n_oct, 16)
    tab_rows = np.stack([t.rows for t in tabs])
    return ShardedIndexArrays(
        n_shards=n_shards, shard_bits=shard_bits, n_slots=n_slots,
        tab_rows=tab_rows, occ_oct=occ_oct,
        n_evicted=n_evicted)
