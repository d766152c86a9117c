"""Open-addressing k-mer hash table, built on host, probed on device.

Replaces the reference's SSHash minimizer dictionary (external pufferfish;
see SURVEY.md §2.3). An MPHF is pointer-chasing and build-heavy; on TPU we
want a branch-free, bounded-probe gather. Design:

- keys are canonical k-mers split into two 32-bit planes (hi, lo) so the
  device never needs 64-bit integers,
- desired slot = murmur-style 32-bit mix of (hi, lo) masked to table size,
- layout = linear probing in *robin-hood order*: sort keys by desired slot,
  then final_slot[i] = max(desired[i], final[i-1]+1), computed as a single
  vectorized scan (final = cummax(desired - i) + i). The table physically has
  H + max_probe slots so device probes never need a modulo.
- probe bound is recorded at build time and is a static in the jitted lookup.
- the table is stored as ONE (H + max_probes, 4) int32 row matrix
  `(hi, lo, occ_start, occ_count)`: a probe is a single row gather and the
  hit resolves straight to the occurrence CSR range — no payload
  indirection. (On this TPU backend each separate 1-D gather costs ~10s of
  XLA compile and 2x the runtime of a row gather; packing is load-bearing.)

Build cost is one argsort over the unique k-mers — O(n log n) with numpy
vector ops only, human-transcriptome scale builds in seconds.
"""

from __future__ import annotations

import dataclasses

import numpy as np

EMPTY_HI = -1  # int32 sentinel; valid hi < 2^30 for k <= 31


def split_u64(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split uint64 keys into (hi, lo) int32 planes (bit patterns)."""
    return ((keys >> np.uint64(32)).astype(np.uint32).view(np.int32),
            (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32))


def mix32(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """32-bit avalanche hash of a (hi, lo) key pair (murmur3 finalizer).

    Must match the device-side implementation in salmon_tpu.mapping.lookup.
    """
    hi = hi.astype(np.uint32)
    lo = lo.astype(np.uint32)
    x = lo ^ (hi * np.uint32(0x9E3779B9)) ^ np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x *= np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return x


@dataclasses.dataclass
class KmerHashTable:
    """Flat probe table mapping canonical k-mer -> occurrence CSR range."""
    rows: np.ndarray         # (H + max_probes, 4) int32: hi, lo, start, cnt
    n_slots: int             # H (power of two)
    max_probes: int          # static probe bound for the device loop

    @property
    def mask(self) -> int:
        return self.n_slots - 1


def build_hash_table(keys_u64: np.ndarray,
                     occ_offsets: np.ndarray | None = None,
                     load_factor: float = 0.5,
                     min_probes: int = 4) -> KmerHashTable:
    """Build the probe table for a set of *unique* uint64 keys.

    occ_offsets: (n + 1,) CSR offsets aligned with the sorted-unique key
    order; slot payload becomes (start, count). When None, payload is
    (rank, 1) — the key's index in the input order.
    """
    n = int(keys_u64.shape[0])
    h = 1 << max(4, int(np.ceil(np.log2(max(n, 1) / load_factor))))
    hi, lo = split_u64(keys_u64)
    desired = (mix32(hi, lo) & np.uint32(h - 1)).astype(np.int64)

    order = np.argsort(desired, kind="stable")
    d_sorted = desired[order]
    idx = np.arange(n, dtype=np.int64)
    final = np.maximum.accumulate(d_sorted - idx) + idx
    probe_dist = final - d_sorted
    max_probe = int(probe_dist.max()) + 1 if n else 1
    max_probe = max(max_probe, min_probes)

    if occ_offsets is None:
        starts = np.arange(n, dtype=np.int32)
        counts = np.ones(n, dtype=np.int32)
    else:
        starts = occ_offsets[:-1].astype(np.int32)
        counts = np.diff(occ_offsets).astype(np.int32)

    size = h + max_probe
    rows = np.zeros((size, 4), dtype=np.int32)
    rows[:, 0] = EMPTY_HI
    rows[final, 0] = hi[order]
    rows[final, 1] = lo[order]
    rows[final, 2] = starts[order]
    rows[final, 3] = counts[order]
    return KmerHashTable(rows, h, max_probe)


def lookup_host(tab: KmerHashTable, keys_u64: np.ndarray):
    """Host-side reference lookup (for tests): (start, count) or (-1, 0)."""
    hi, lo = split_u64(keys_u64)
    slot0 = (mix32(hi, lo) & np.uint32(tab.n_slots - 1)).astype(np.int64)
    start = np.full(keys_u64.shape, -1, dtype=np.int32)
    count = np.zeros(keys_u64.shape, dtype=np.int32)
    pending = np.ones(keys_u64.shape, dtype=bool)
    for p in range(tab.max_probes):
        s = slot0 + p
        match = pending & (tab.rows[s, 0] == hi) & (tab.rows[s, 1] == lo)
        start[match] = tab.rows[s, 2][match]
        count[match] = tab.rows[s, 3][match]
        pending &= ~match
    return start, count
