"""Open-addressing k-mer hash table, built on host, probed on device.

Replaces the reference's SSHash minimizer dictionary (external pufferfish;
see SURVEY.md §2.3). An MPHF is pointer-chasing and build-heavy; on TPU we
want a branch-free, bounded-probe gather. Design:

- desired slot = murmur-style 32-bit mix of the k-mer's (hi, lo) planes
  masked to table size,
- layout = linear probing in *robin-hood order*: sort keys by desired slot,
  then final_slot[i] = max(desired[i], final[i-1]+1), computed as a single
  vectorized scan (final = cummax(desired - i) + i). The table physically
  has H + max_probe slots so device probes never need a modulo.
- probe bound is recorded at build time and is a static in the jitted
  lookup.
- COMPACT 8-byte slots: (fpcnt, start) int32 pairs where fpcnt packs a
  16-bit key fingerprint (the mix's high bits — independent of the slot
  index bits) with the 16-bit-saturated occurrence count, and start is the
  CSR offset. Verification is by fingerprint only: a ~1/65k false positive
  yields occurrences of a different k-mer, which the chaining filter and
  DP validation discard — the same grace the reference extends to
  multimapping noise. Halving the slot width is load-bearing at human
  scale: 300M k-mers fit the device in ~4.3 GB instead of 17 GB, and two
  slots ride every 16-byte row gather so the probe sequence costs half
  the rows.
- the table is stored as ONE (ceil(S/2), 4) int32 row matrix interleaving
  slot pairs: row r = [fpcnt(2r), start(2r), fpcnt(2r+1), start(2r+1)].

Build cost is one argsort over the unique k-mers — O(n log n) with numpy
vector ops only.
"""

from __future__ import annotations

import dataclasses

import numpy as np


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


def fingerprint16(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """16-bit verification fingerprint: the mix's high bits (the slot
    index uses the low bits, so these stay informative)."""
    return (mix32(hi, lo) >> np.uint32(16)).astype(np.uint32)


@dataclasses.dataclass
class KmerHashTable:
    """Flat probe table mapping canonical k-mer -> occurrence CSR range."""
    rows: np.ndarray         # (ceil(S/2), 4) int32 slot pairs (fpcnt, start)
    n_slots: int             # H (power of two)
    max_probes: int          # static probe bound for the device loop
    n_evicted: int = 0       # keys dropped by the probe cap

    @property
    def mask(self) -> int:
        return self.n_slots - 1


def build_hash_table(keys_u64: np.ndarray,
                     occ_offsets: np.ndarray | None = None,
                     load_factor: float = 0.5,
                     max_load_factor: float = 0.62,
                     min_probes: int = 4,
                     probe_cap: int = 16) -> KmerHashTable:
    """Build the probe table for a set of *unique* uint64 keys.

    occ_offsets: (n + 1,) CSR offsets aligned with the sorted-unique key
    order; slot payload becomes (start, count). When None, payload is
    (rank, 1) — the key's index in the input order.

    Sizing: the power-of-two size targets `load_factor` but is halved
    while the load stays under `max_load_factor` — a 312M-kmer human
    transcriptome lands at 2^29 slots (4.3 GB) instead of 2^30 (8.6 GB).
    Probing is CAPPED at `probe_cap`: the rare keys whose robin-hood
    displacement exceeds the cap are evicted (their seeds are simply
    absent, like the reference's repetitive-seed skips) so device lookup
    cost stays bounded at scale; the eviction count is recorded.
    """
    n = int(keys_u64.shape[0])
    h = 1 << max(4, int(np.ceil(np.log2(max(n, 1) / load_factor))))
    while h >= 32 and n / (h // 2) <= max_load_factor:
        h //= 2
    hi, lo = split_u64(keys_u64)
    mixed = mix32(hi, lo)
    desired = (mixed & np.uint32(h - 1)).astype(np.int64)
    fp = (mixed >> np.uint32(16)).astype(np.uint32)

    order = np.argsort(desired, kind="stable")
    d_sorted = desired[order]
    idx = np.arange(n, dtype=np.int64)
    final = np.maximum.accumulate(d_sorted - idx) + idx
    probe_dist = final - d_sorted
    keep = probe_dist < probe_cap
    n_evicted = int((~keep).sum())
    max_probe = int(probe_dist[keep].max()) + 1 if keep.any() else 1
    max_probe = max(max_probe, min_probes)

    if occ_offsets is None:
        starts = np.arange(n, dtype=np.int32)
        counts = np.ones(n, dtype=np.int64)
    else:
        starts = occ_offsets[:-1].astype(np.int32)
        counts = np.diff(occ_offsets)
    counts16 = np.minimum(counts, 0xFFFF).astype(np.uint32)
    fpcnt = ((fp << np.uint32(16)) | counts16).view(np.int32)

    size = h + max_probe
    size2 = -(-size // 2)
    slots = np.zeros((size2 * 2, 2), dtype=np.int32)
    slots[final[keep], 0] = fpcnt[order][keep]
    slots[final[keep], 1] = starts[order][keep]
    rows = slots.reshape(size2, 4)
    return KmerHashTable(rows, h, max_probe, n_evicted)


def lookup_host(tab: KmerHashTable, keys_u64: np.ndarray):
    """Host-side reference lookup (for tests): (start, count) or (-1, 0)."""
    hi, lo = split_u64(keys_u64)
    mixed = mix32(hi, lo)
    slot0 = (mixed & np.uint32(tab.n_slots - 1)).astype(np.int64)
    fp = (mixed >> np.uint32(16)).astype(np.uint32)
    slots = tab.rows.reshape(-1, 2)
    start = np.full(keys_u64.shape, -1, dtype=np.int32)
    count = np.zeros(keys_u64.shape, dtype=np.int32)
    pending = np.ones(keys_u64.shape, dtype=bool)
    for p in range(tab.max_probes):
        s = slot0 + p
        fpcnt = slots[s, 0].view(np.uint32)
        match = pending & ((fpcnt >> np.uint32(16)) == fp) & (fpcnt != 0)
        start[match] = slots[s, 1][match]
        count[match] = (fpcnt & np.uint32(0xFFFF)).astype(
            np.int32)[match]
        pending &= ~match
    return start, count
