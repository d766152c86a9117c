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

import json
import os

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


# ---------------------------------------------------------------------------
# streamed sharding straight from the on-disk v5 planes (genome scale)
# ---------------------------------------------------------------------------

_STREAM_CHUNK = 1 << 27


def _stream_keys(index_dir: str, meta: dict, chunk: int = _STREAM_CHUNK):
    """Yield (start, keys_u64) chunks reconstructing the absolute sorted
    keys from the v5 delta32 (or raw) plane without a full-size decode
    transient. Reference role: PufferfishIndex deserialization
    (include/salmon/internal/index/SalmonIndex.hpp:201) — the reference
    mmaps; we stream-decode."""
    mode = meta.get("kmer_mode", "raw")
    if mode == "ef":
        from salmon_tpu.index import diskfmt
        z = {"ef_low": np.load(os.path.join(index_dir,
                                            "kmer_ef_low.npy"),
                               mmap_mode="r"),
             "ef_high": np.load(os.path.join(index_dir,
                                             "kmer_ef_high.npy"),
                                mmap_mode="r"),
             "ef_l": meta["kmer_ef_l"], "ef_n": meta["kmer_ef_n"]}
        yield from diskfmt.iter_keys_ef(z, chunk=chunk)
        return
    if mode != "delta32":
        km = np.load(os.path.join(index_dir, "kmers.npy"), mmap_mode="r")
        for i in range(0, km.shape[0], chunk):
            yield i, np.asarray(km[i:i + chunk], np.uint64)
        return
    d32 = np.load(os.path.join(index_dir, "kmer_d32.npy"), mmap_mode="r")
    esc_idx = np.load(os.path.join(index_dir, "kmer_esc_idx.npy"))
    esc_val = np.load(os.path.join(index_dir, "kmer_esc_val.npy"))
    n = d32.shape[0]
    carry = np.uint64(0)
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        d = np.asarray(d32[i:j]).astype(np.uint64)
        lo = np.searchsorted(esc_idx, i)
        hi = np.searchsorted(esc_idx, j)
        if hi > lo:
            d[esc_idx[lo:hi] - i] = esc_val[lo:hi]
        keys = np.cumsum(d, dtype=np.uint64)
        keys += carry
        carry = keys[-1] if j > i else carry
        yield i, keys


def iter_shard_arrays(index_dir: str, n_shards: int,
                      load_factor: float = 0.7,
                      max_load_factor: float = 0.8):
    """Generator over per-shard device planes built straight from a
    saved v5 index — the genome-scale (BASELINE config 5) load path.

    Unlike shard_index_arrays (which takes a fully-loaded index and
    stacks all shards at once), this streams the key plane per shard
    and gathers each shard's occurrence slice from the memmapped occ48
    plane, so peak host memory is one shard's arrays plus the shared
    counts/starts/owner planes (~45 GB at 3.27G keys) instead of the
    ~90 GB full-index load. Table placement runs in native C
    (native/kmersort.cpp table_place).

    The default load factor targets ~0.73 (4-slot two-choice buckets
    with cuckoo kicks stay total well past 0.9): a 3.27G-key index at 8
    shards lands at 2^29 slots = 4.3 GB table + ~3.6 GB occurrence
    plane per chip.

    Yields (shard_id, meta0, shard_dict) where shard_dict has tab_rows
    (n_buckets, 8) int32, occ_txp / occ_pf (n_s,) int32 (incl. the
    shadow-merge appendix), n_slots, shard_bits, n_evicted. meta0 is
    the index info.json dict (yielded with every shard)."""
    if n_shards & (n_shards - 1):
        raise ValueError(f"n_shards must be a power of two, got {n_shards}")
    shard_bits = int(n_shards).bit_length() - 1
    with open(os.path.join(index_dir, "info.json")) as fh:
        meta = json.load(fh)
    from salmon_tpu.index import diskfmt

    def z(name):
        return np.load(os.path.join(index_dir, f"{name}.npy"),
                       mmap_mode="r")

    counts64 = diskfmt.unpack_counts(
        {"occ_cnt8": z("occ_cnt8"),
         "occ_cnt_esc_idx": z("occ_cnt_esc_idx"),
         "occ_cnt_esc_val": z("occ_cnt_esc_val")})
    n = counts64.shape[0]
    counts = counts64.astype(np.int32)
    del counts64
    if os.path.exists(os.path.join(index_dir, "occ_pad8.npy")):
        raise ValueError(
            "iter_shard_arrays expects a table-less (unaligned) CSR; "
            "this index is oct-aligned — use shard_index_arrays after "
            "load_index")
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])

    # pass 1: owner per key (u8)
    owner = np.empty(n, np.uint8)
    for i, keys in _stream_keys(index_dir, meta):
        hi, lo = split_u64(keys)
        owner[i:i + keys.shape[0]] = shard_owner(
            hi, lo, shard_bits).astype(np.uint8)
    pop = np.bincount(owner, minlength=n_shards)
    n_slots = table_n_slots(int(pop.max()) if pop.size else 1,
                            load_factor, max_load_factor)

    # sparse true-count escapes (pruned indexes)
    tc_idx = tc_val = None
    if meta.get("has_true_counts"):
        tc_idx = np.asarray(z("occ_true_esc_idx"))
        tc_val = np.asarray(z("occ_true_esc_val"))

    occ_mode = meta.get("occ_mode", "raw")
    if occ_mode == "occ48":
        occ_packed = z("occ48")
        sep_halved = meta.get("occ48_sep_halved", False)
    else:
        occ_txp_mm = z("occ_txp")
        occ_pf_mm = z("occ_pf")

    from salmon_tpu.index.native_kmers import gather_rows_native
    for s in range(n_shards):
        ns = int(pop[s])
        keys_s = np.empty(ns, np.uint64)
        midx = np.empty(ns, np.int64)
        w = 0
        for i, keys in _stream_keys(index_dir, meta):
            m = owner[i:i + keys.shape[0]] == s
            k = int(m.sum())
            keys_s[w:w + k] = keys[m]
            midx[w:w + k] = np.nonzero(m)[0] + i
            w += k
        cnt_s = counts[midx].astype(np.int64)
        off_s = np.zeros(ns + 1, np.int64)
        np.cumsum(cnt_s, out=off_s[1:])
        total_s = int(off_s[-1])
        gidx = (np.repeat(starts[midx], cnt_s)
                + np.arange(total_s, dtype=np.int64)
                - np.repeat(off_s[:-1], cnt_s))
        if occ_mode == "occ48":
            rec = gather_rows_native(occ_packed, gidx)
            txp_s, pf_s = diskfmt.unpack_occ48(rec, sep_halved=sep_halved)
            del rec
        else:
            # memmaps pass through uncopied (already C-contiguous)
            txp_s = gather_rows_native(occ_txp_mm, gidx)
            pf_s = gather_rows_native(occ_pf_mm, gidx)
        del gidx
        tc_s = None
        if tc_idx is not None:
            pos = np.searchsorted(midx, tc_idx)
            sel = (pos < ns) & (midx[np.minimum(pos, ns - 1)] == tc_idx)
            if sel.any():
                tc_s = cnt_s.copy()
                tc_s[pos[sel]] = tc_val[sel]
        tab = build_hash_table(
            keys_s, occ_offsets=off_s, n_slots=n_slots,
            filter_counts=tc_s, inline_records=(txp_s, pf_s))
        del keys_s, midx
        if tab.n_shadowed:
            is_sep, gi, sep_fp = appendix_plan(tab)
            txp_s = np.concatenate(
                [txp_s, np.where(is_sep, -1, txp_s[gi]).astype(np.int32)])
            pf_s = np.concatenate(
                [pf_s, np.where(is_sep, sep_fp << 1, pf_s[gi])
                 .astype(np.int32)])
        yield s, meta, {
            "tab_rows": tab.rows, "occ_txp": txp_s, "occ_pf": pf_s,
            "n_slots": n_slots, "shard_bits": shard_bits,
            "n_evicted": tab.n_evicted, "n_keys": ns,
        }
