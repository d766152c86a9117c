"""Open-addressing k-mer hash table, built on host, probed on device.

Replaces the reference's SSHash minimizer dictionary (external pufferfish;
see SURVEY.md §2.3). An MPHF is pointer-chasing and build-heavy; on TPU we
want a branch-free, bounded-probe gather. Design:

- keys are canonical k-mers split into two uint32 planes (hi, lo) so the
  device never needs 64-bit integers,
- desired slot = murmur-style 32-bit mix of (hi, lo) masked to table size,
- layout = linear probing in *robin-hood order*: sort keys by desired slot,
  then final_slot[i] = max(desired[i], final[i-1]+1), computed as a single
  vectorized scan (final = cummax(desired - i) + i). The table physically has
  H + max_probe slots so device probes never need a modulo.
- probe bound is recorded at build time and is a static in the jitted lookup.

Build cost is one argsort over the unique k-mers — O(n log n) with numpy
vector ops only, human-transcriptome scale builds in seconds.
"""

from __future__ import annotations

import dataclasses

import numpy as np

EMPTY_HI = np.uint32(0xFFFFFFFF)  # valid hi < 2^30 for k<=31, so safe sentinel


def split_u64(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split uint64 keys into (hi, lo) uint32 planes."""
    return (keys >> np.uint64(32)).astype(np.uint32), \
        (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)


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
    """Flat probe table mapping canonical k-mer -> payload index.

    payload index points into caller-owned CSR arrays (occurrence lists).
    """
    table_hi: np.ndarray     # (H + max_probes,) uint32, EMPTY_HI = empty
    table_lo: np.ndarray     # (H + max_probes,) uint32
    table_payload: np.ndarray  # (H + max_probes,) int32 index into CSR rows
    n_slots: int             # H (power of two)
    max_probes: int          # static probe bound for the device loop

    @property
    def mask(self) -> int:
        return self.n_slots - 1


def build_hash_table(keys_u64: np.ndarray, load_factor: float = 0.5,
                     min_probes: int = 4) -> KmerHashTable:
    """Build the probe table for a set of *unique* uint64 keys.

    The payload for key `keys_u64[i]` is `i` (its rank in the caller's
    sorted-unique ordering), so CSR offset arrays line up for free.
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

    size = h + max_probe
    table_hi = np.full(size, EMPTY_HI, dtype=np.uint32)
    table_lo = np.zeros(size, dtype=np.uint32)
    table_payload = np.full(size, -1, dtype=np.int32)
    table_hi[final] = hi[order]
    table_lo[final] = lo[order]
    table_payload[final] = order.astype(np.int32)
    return KmerHashTable(table_hi, table_lo, table_payload, h, max_probe)


def lookup_host(tab: KmerHashTable, keys_u64: np.ndarray) -> np.ndarray:
    """Host-side reference lookup (for tests): payload index or -1."""
    hi, lo = split_u64(keys_u64)
    slot0 = (mix32(hi, lo) & np.uint32(tab.n_slots - 1)).astype(np.int64)
    out = np.full(keys_u64.shape, -1, dtype=np.int32)
    pending = np.ones(keys_u64.shape, dtype=bool)
    for p in range(tab.max_probes):
        s = slot0 + p
        match = pending & (tab.table_hi[s] == hi) & (tab.table_lo[s] == lo)
        out[match] = tab.table_payload[s][match]
        pending &= ~match
    return out
