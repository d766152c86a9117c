"""Two-choice bucketized k-mer hash table, built on host, probed on device.

Replaces the reference's SSHash minimizer dictionary (external pufferfish;
see SURVEY.md §2.3). An MPHF is pointer-chasing and build-heavy; on TPU we
want a branch-free, fixed-gather lookup. Design:

- the table is an array of BUCKETS of 8 compact slots. Every key has TWO
  candidate buckets (independent 32-bit mixes of its (hi, lo) planes);
  the build places it in its first bucket, falling back to the second on
  overflow (vectorized two-round placement). Lookup gathers BOTH bucket
  rows — two (16 x int32) ROW gathers per query (row gathers on this
  backend cost ~3-8 ns per row with payload width nearly free, so two
  64-byte bucket rows beat seven 16-byte probe rows) — and 16 branch-
  free fingerprint compares select the hit.
- COMPACT 8-byte slots: (fpcnt, start) int32 pairs where fpcnt packs a
  16-bit key fingerprint with the 16-bit-saturated occurrence count, and
  start is the occurrence-CSR offset. The fingerprint comes from a THIRD
  independent mix — never from a bucket hash, whose low bits equal the
  bucket index at human-scale bucket counts and would collapse the
  in-bucket discrimination to a couple of bits. A ~1/65k false positive
  yields occurrences of a different k-mer, which the chaining filter and
  DP validation discard — the same grace the reference extends to
  multimapping noise.
- keys overflowing BOTH buckets are evicted highest-occurrence-first
  (the least informative, repetitive seeds — the ones the reference's
  maxOccsPerHit filters skip anyway); the count is recorded at build.
  With two choices at the default sizing (load <= 0.62, ~5 keys/bucket
  expected) evictions run on the order of 1e-4..1e-3 of keys (greedy
  two-round placement, no cuckoo kicks), recorded in n_evicted.

Build cost is a few argsorts over the unique k-mers — O(n log n) numpy
vector ops only. Half the HBM of the previous 2-slot-row linear-probe
layout at equal key count (312M-kmer human transcriptome: ~4.3 GB).
"""

from __future__ import annotations

import dataclasses

import numpy as np

SLOTS_PER_BUCKET = 8


def split_u64(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split uint64 keys into (hi, lo) int32 planes (bit patterns)."""
    return ((keys >> np.uint64(32)).astype(np.uint32).view(np.int32),
            (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32))


def mix32(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """First bucket hash (murmur3 finalizer over the key planes).

    Must match the device-side implementation in salmon_tpu.mapping.lookup.
    """
    hi = np.asarray(hi).astype(np.uint32)
    lo = np.asarray(lo).astype(np.uint32)
    x = lo ^ (hi * np.uint32(0x9E3779B9)) ^ np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x *= np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return x


def mix32b(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Second (alternate) bucket hash — independent constants."""
    hi = np.asarray(hi).astype(np.uint32)
    lo = np.asarray(lo).astype(np.uint32)
    x = hi ^ (lo * np.uint32(0x85EBCA77)) ^ np.uint32(0xC2B2AE3D)
    x ^= x >> np.uint32(17)
    x *= np.uint32(0xED5AD4BB)
    x ^= x >> np.uint32(11)
    x *= np.uint32(0xAC4C1B51)
    x ^= x >> np.uint32(15)
    return x


def fingerprint16(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """16-bit verification fingerprint from a third independent mix (no
    bit shared with either bucket index)."""
    hi = np.asarray(hi).astype(np.uint32)
    lo = np.asarray(lo).astype(np.uint32)
    x = hi ^ (lo * np.uint32(0xCC9E2D51)) ^ np.uint32(0x1B873593)
    x ^= x >> np.uint32(15)
    x *= np.uint32(0xD168AAAD)
    x ^= x >> np.uint32(15)
    x *= np.uint32(0xAF723597)
    x ^= x >> np.uint32(15)
    return (x >> np.uint32(16)).astype(np.uint32)


@dataclasses.dataclass
class KmerHashTable:
    """Two-choice bucket table: canonical k-mer -> occurrence CSR range."""
    rows: np.ndarray         # (n_buckets, 16) int32: 8 x (fpcnt, start)
    n_slots: int             # total slots = n_buckets * 8 (power of two)
    max_probes: int = 2 * SLOTS_PER_BUCKET   # slots examined per query
    n_evicted: int = 0       # keys dropped (overflowed both buckets)

    @property
    def n_buckets(self) -> int:
        return self.n_slots // SLOTS_PER_BUCKET

    @property
    def mask(self) -> int:
        return self.n_buckets - 1


def _rank_in_bucket(bucket: np.ndarray, counts: np.ndarray):
    """Per-key rank within its bucket, lowest occurrence count first
    (ties by input order). Returns (rank, order) where order is the
    lexsort permutation the rank is aligned with the INPUT via."""
    n = bucket.shape[0]
    order = np.lexsort((counts, bucket))
    b_sorted = bucket[order]
    run_start = np.ones(n, dtype=bool)
    if n:
        run_start[1:] = b_sorted[1:] != b_sorted[:-1]
    first_idx = np.maximum.accumulate(
        np.where(run_start, np.arange(n, dtype=np.int64), 0))
    rank_sorted = np.arange(n, dtype=np.int64) - first_idx
    rank = np.empty(n, dtype=np.int64)
    rank[order] = rank_sorted
    return rank


def table_n_slots(n_keys: int, load_factor: float = 0.5,
                  max_load_factor: float = 0.62) -> int:
    """Power-of-two slot count for `n_keys`: targets `load_factor` but
    halves while the load stays under `max_load_factor`."""
    h = 1 << max(6, int(np.ceil(np.log2(max(n_keys, 1) / load_factor))))
    while (h >= SLOTS_PER_BUCKET * 2
           and n_keys / (h // 2) <= max_load_factor):
        h //= 2
    return h


def build_hash_table(keys_u64: np.ndarray,
                     occ_offsets: np.ndarray | None = None,
                     load_factor: float = 0.5,
                     max_load_factor: float = 0.62,
                     n_slots: int | None = None) -> KmerHashTable:
    """Build the two-choice bucket table for *unique* uint64 keys.

    occ_offsets: (n + 1,) CSR offsets aligned with the sorted-unique key
    order; slot payload becomes (start, count). When None, payload is
    (rank, 1) — the key's index in the input order.

    Sizing: the power-of-two slot count targets `load_factor` but is
    halved while the load stays under `max_load_factor` — a 312M-kmer
    human transcriptome lands at 2^29 slots = 2^26 buckets (4.3 GB).
    `n_slots` overrides the sizing (the sharded index forces one common
    size across shards so the stacked tables tile a mesh axis).
    """
    n = int(keys_u64.shape[0])
    h = n_slots or table_n_slots(n, load_factor, max_load_factor)
    n_buckets = h // SLOTS_PER_BUCKET
    hi, lo = split_u64(keys_u64)
    mask = np.uint32(n_buckets - 1)
    b1 = (mix32(hi, lo) & mask).astype(np.int64)
    b2 = (mix32b(hi, lo) & mask).astype(np.int64)
    fp = fingerprint16(hi, lo)

    if occ_offsets is None:
        starts = np.arange(n, dtype=np.int32)
        counts = np.ones(n, dtype=np.int64)
    else:
        starts = occ_offsets[:-1].astype(np.int32)
        counts = np.diff(occ_offsets)

    # balanced first choice (power of two choices): each key prefers the
    # candidate bucket with lower total candidate pressure, which evens
    # bucket fills and collapses the overflow tail
    cand1 = np.bincount(b1, minlength=n_buckets)
    cand2 = np.bincount(b2, minlength=n_buckets)
    prefer1 = cand1[b1] <= cand2[b2]
    first = np.where(prefer1, b1, b2)
    second = np.where(prefer1, b2, b1)

    # round 1: place in the preferred bucket, 8 lowest-count keys win
    rank1 = _rank_in_bucket(first, counts)
    placed1 = rank1 < SLOTS_PER_BUCKET
    used = np.bincount(first[placed1], minlength=n_buckets)

    # round 2: overflow keys fall back to the alternate's remaining
    # capacity
    idx2 = np.nonzero(~placed1)[0]
    rank2 = _rank_in_bucket(second[idx2], counts[idx2])
    cap2 = SLOTS_PER_BUCKET - used
    placed2 = rank2 < cap2[second[idx2]]
    n_evicted = int((~placed2).sum())

    counts16 = np.minimum(counts, 0xFFFF).astype(np.uint32)
    fpcnt = ((fp << np.uint32(16)) | counts16).view(np.int32)

    rows = np.zeros((n_buckets, 2 * SLOTS_PER_BUCKET), dtype=np.int32)
    k1 = np.nonzero(placed1)[0]
    rows[first[k1], 2 * rank1[k1]] = fpcnt[k1]
    rows[first[k1], 2 * rank1[k1] + 1] = starts[k1]
    k2 = idx2[placed2]
    slot2 = (used[second[k2]] + rank2[placed2]).astype(np.int64)
    rows[second[k2], 2 * slot2] = fpcnt[k2]
    rows[second[k2], 2 * slot2 + 1] = starts[k2]
    return KmerHashTable(rows, h, 2 * SLOTS_PER_BUCKET, n_evicted)


def lookup_host(tab: KmerHashTable, keys_u64: np.ndarray):
    """Host-side reference lookup (for tests): (start, count) or (-1, 0)."""
    hi, lo = split_u64(keys_u64)
    mask = np.uint32(tab.n_buckets - 1)
    b1 = (mix32(hi, lo) & mask).astype(np.int64)
    b2 = (mix32b(hi, lo) & mask).astype(np.int64)
    fp = fingerprint16(hi, lo)
    rows = np.concatenate([tab.rows[b1], tab.rows[b2]],
                          axis=-1)               # (..., 32)
    start = np.full(keys_u64.shape, -1, dtype=np.int32)
    count = np.zeros(keys_u64.shape, dtype=np.int32)
    pending = np.ones(keys_u64.shape, dtype=bool)
    for p in range(2 * SLOTS_PER_BUCKET):
        fpcnt = rows[..., 2 * p].view(np.uint32)
        match = pending & ((fpcnt >> np.uint32(16)) == fp) & (fpcnt != 0)
        start[match] = rows[..., 2 * p + 1][match]
        count[match] = (fpcnt & np.uint32(0xFFFF)).astype(
            np.int32)[match]
        pending &= ~match
    return start, count
