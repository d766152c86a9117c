"""ctypes bindings for the native index-build hot path
(native/kmersort.cpp): parallel canonical k-mer enumeration + radix
sort. Falls back to None when the shared library is unavailable; the
builder then uses the pure-numpy path (utils.dna + np.argsort).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _native_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libsalmontpu.so")
    try:
        if not os.path.exists(so):
            import sys
            sys.path.insert(0, os.path.dirname(os.path.dirname(so)))
            from native.build import build
            so = build()
        lib = ctypes.CDLL(so)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.kmer_count.restype = ctypes.c_int64
        lib.kmer_count.argtypes = [u8p, i64p, ctypes.c_int64,
                                   ctypes.c_int32, i64p]
        lib.kmer_enumerate.restype = None
        lib.kmer_enumerate.argtypes = [u8p, i64p, ctypes.c_int64,
                                       ctypes.c_int32, i64p, u64p, u64p]
        lib.radix_sort_u64.restype = None
        lib.radix_sort_u64.argtypes = [u64p, u64p, ctypes.c_int64,
                                       ctypes.c_int32, u64p, u64p]
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.kmer_decode_payload.restype = None
        lib.kmer_decode_payload.argtypes = [u64p, ctypes.c_int64, i32p,
                                            i32p, u8p]
        lib.kmer_count_part.restype = ctypes.c_int64
        lib.kmer_count_part.argtypes = [u8p, i64p, ctypes.c_int64,
                                        ctypes.c_int32, i64p,
                                        ctypes.c_int32, ctypes.c_uint64]
        lib.kmer_enumerate_part.restype = None
        lib.kmer_enumerate_part.argtypes = [u8p, i64p, ctypes.c_int64,
                                            ctypes.c_int32, i64p, u64p,
                                            u64p, ctypes.c_int32,
                                            ctypes.c_uint64]
        lib.kmer_decode_payload_pf.restype = None
        lib.kmer_decode_payload_pf.argtypes = [u64p, ctypes.c_int64,
                                               i32p, i32p]
        lib.oct_align_pads.restype = None
        lib.oct_align_pads.argtypes = [i64p, ctypes.c_int64,
                                       ctypes.c_int64, i64p]
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.table_place.restype = ctypes.c_int64
        lib.table_place.argtypes = [u64p, u32p, ctypes.c_int64,
                                    ctypes.c_int64, i32p]
        lib.gather_rows.restype = None
        lib.gather_rows.argtypes = [u8p, i64p, ctypes.c_int64,
                                    ctypes.c_int64, u8p]
    except (OSError, AttributeError, Exception):
        return None
    _LIB = lib
    return lib


def available() -> bool:
    return _native_lib() is not None


def enumerate_sorted(seq_codes: np.ndarray, seq_offsets: np.ndarray,
                     k: int) -> Optional[tuple]:
    """Enumerate all transcripts' canonical k-mers, sorted by k-mer
    (stable: occurrences stay in (transcript, position) order).

    Returns (kmers u64, txp i32, pos i32, fwd bool) or None when the
    native library is unavailable.
    """
    lib = _native_lib()
    if lib is None:
        return None
    seq = np.ascontiguousarray(seq_codes, np.uint8)
    off = np.ascontiguousarray(seq_offsets, np.int64)
    n_txps = off.shape[0] - 1
    counts = np.zeros(max(n_txps, 1), np.int64)
    total = int(lib.kmer_count(seq, off, n_txps, k, counts))
    keys = np.empty(total, np.uint64)
    payload = np.empty(total, np.uint64)
    if total:
        starts = np.zeros(n_txps, np.int64)
        starts[1:] = np.cumsum(counts[:n_txps])[:-1]
        lib.kmer_enumerate(seq, off, n_txps, k, starts, keys, payload)
        tk = np.empty(total, np.uint64)
        tp = np.empty(total, np.uint64)
        lib.radix_sort_u64(keys, payload, total, 2 * k, tk, tp)
        del tk, tp
    tx = np.empty(total, np.int32)
    po = np.empty(total, np.int32)
    fw8 = np.empty(total, np.uint8)
    if total:
        lib.kmer_decode_payload(payload, total, tx, po, fw8)
    return keys, tx, po, fw8.view(bool)


def count_total(seq_codes: np.ndarray, seq_offsets: np.ndarray,
                k: int) -> int:
    """Total valid k-mer windows (cheap parallel pre-count)."""
    lib = _native_lib()
    seq = np.ascontiguousarray(seq_codes, np.uint8)
    off = np.ascontiguousarray(seq_offsets, np.int64)
    n_txps = off.shape[0] - 1
    if lib is None:
        lens = np.diff(off)
        return int(np.maximum(lens - (k - 1), 0).sum())  # upper bound
    counts = np.zeros(max(n_txps, 1), np.int64)
    return int(lib.kmer_count(seq, off, n_txps, k, counts))


def enumerate_sorted_partitioned(seq_codes: np.ndarray,
                                 seq_offsets: np.ndarray, k: int,
                                 part_bits: int):
    """Generator over (keys, txp, pos, fwd) per canonical-top-bits
    partition, each sorted; concatenating the partitions in order
    yields exactly enumerate_sorted's output with peak buffer memory
    ~1/2^part_bits of the flat path (genome-decoy-scale builds). Yields
    None when the native library is unavailable."""
    lib = _native_lib()
    if lib is None:
        yield None
        return
    seq = np.ascontiguousarray(seq_codes, np.uint8)
    off = np.ascontiguousarray(seq_offsets, np.int64)
    n_txps = off.shape[0] - 1
    low_bits = 2 * k - part_bits
    for part in range(1 << part_bits):
        counts = np.zeros(max(n_txps, 1), np.int64)
        total = int(lib.kmer_count_part(seq, off, n_txps, k, counts,
                                        part_bits, part))
        keys = np.empty(total, np.uint64)
        payload = np.empty(total, np.uint64)
        if total:
            starts = np.zeros(n_txps, np.int64)
            starts[1:] = np.cumsum(counts[:n_txps])[:-1]
            lib.kmer_enumerate_part(seq, off, n_txps, k, starts, keys,
                                    payload, part_bits, part)
            tk = np.empty(total, np.uint64)
            tp = np.empty(total, np.uint64)
            # top part_bits are constant within a partition: sort the
            # low bits only (fewer radix passes)
            lib.radix_sort_u64(keys, payload, total, low_bits, tk, tp)
            del tk, tp
        tx = np.empty(total, np.int32)
        pf = np.empty(total, np.int32)
        if total:
            lib.kmer_decode_payload_pf(payload, total, tx, pf)
        yield keys, tx, pf


def table_place_native(keys_u64: np.ndarray, counts: np.ndarray,
                       n_buckets: int):
    """Two-choice placement (hashtable.build_hash_table rounds 1-3) via
    the parallel native path. Returns (slot_key (n_buckets, 4) int32
    with -1 empties, n_evicted) or None when the library is
    unavailable. Bit-identical to the numpy placement."""
    lib = _native_lib()
    if lib is None or not hasattr(lib, "table_place"):
        return None
    if keys_u64.shape[0] >= 2**31:
        # slot_key entries are int32 key indices; a single table past
        # 2^31 keys would silently truncate — use more index shards
        raise ValueError(
            f"{keys_u64.shape[0]} keys exceed the int32 placement "
            "range of one table; raise --indexShards")
    keys = np.ascontiguousarray(keys_u64, np.uint64)
    cnt = np.ascontiguousarray(counts, np.uint32)
    slot_key = np.empty(n_buckets * 4, np.int32)
    n_evicted = int(lib.table_place(keys, cnt,
                                    np.int64(keys.shape[0]),
                                    np.int64(n_buckets), slot_key))
    return slot_key.reshape(n_buckets, 4), n_evicted


def gather_rows_native(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Parallel dst[i] = src[idx[i]] row gather (2-D src, any dtype);
    falls back to numpy fancy indexing without the library."""
    lib = _native_lib()
    src = np.ascontiguousarray(src)
    if lib is None or not hasattr(lib, "gather_rows"):
        return src[idx]
    idx = np.ascontiguousarray(idx, np.int64)
    row_bytes = src.dtype.itemsize * (
        int(np.prod(src.shape[1:])) if src.ndim > 1 else 1)
    dst = np.empty((idx.shape[0],) + src.shape[1:], src.dtype)
    lib.gather_rows(src.view(np.uint8).reshape(-1), idx,
                    np.int64(idx.shape[0]), np.int64(row_bytes),
                    dst.view(np.uint8).reshape(-1))
    return dst


def oct_align_pads_native(counts: np.ndarray, cap: int,
                          pads_out: np.ndarray) -> bool:
    """Fill pads_out via the native greedy pass. Returns False when the
    library is unavailable (caller falls back to Python)."""
    lib = _native_lib()
    if lib is None or not hasattr(lib, "oct_align_pads"):
        return False
    lib.oct_align_pads(counts, np.int64(counts.shape[0]),
                       np.int64(cap), pads_out)
    return True
