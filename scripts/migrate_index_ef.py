"""Re-encode a v5 index's delta32 key plane as Elias-Fano in place
(streamed: decode d32 chunks -> EF writer; no full-size transients).
Only migrates when EF is actually smaller. Genome-scale index:
keys 15.9 -> ~13.3 GB.

Usage: python scripts/migrate_index_ef.py <index_dir>
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def migrate(index_dir: str) -> None:
    t0 = time.time()
    info_path = os.path.join(index_dir, "info.json")
    with open(info_path) as fh:
        meta = json.load(fh)
    if meta.get("kmer_mode") != "delta32":
        print(f"{index_dir}: kmer_mode={meta.get('kmer_mode')}; "
              "nothing to migrate")
        return
    from salmon_tpu.index import diskfmt
    from salmon_tpu.index.shard import _stream_keys
    from numpy.lib.format import open_memmap

    n = int(meta["num_kmers"])
    # probe the last chunk for U (keys are sorted)
    last = None
    for _, keys in _stream_keys(index_dir, meta):
        last = int(keys[-1])
    U = last + 1
    l = max(int(np.floor(np.log2(max(U / max(n, 1), 1.0)))), 0)
    size_ef = (n * l + n + ((U - 1) >> l) + 1) / 8
    size_d32 = sum(
        os.path.getsize(os.path.join(index_dir, f))
        for f in ("kmer_d32.npy", "kmer_esc_idx.npy",
                  "kmer_esc_val.npy"))
    print(f"# n={n} l={l}: EF {size_ef / 2**30:.2f} GiB vs delta32 "
          f"{size_d32 / 2**30:.2f} GiB")
    if size_ef >= size_d32:
        print(f"{index_dir}: delta32 already smaller; keeping")
        return

    n_low_bytes = -(-(n * l) // 8)
    low = open_memmap(os.path.join(index_dir, "kmer_ef_low.npy"),
                      mode="w+", dtype=np.uint8, shape=(n_low_bytes,))
    n_hi_bits = n + ((U - 1) >> l) + 1
    high = np.zeros(-(-n_hi_bits // 8), np.uint8)
    for i, kc in _stream_keys(index_dir, meta, chunk=1 << 24):
        diskfmt._ef_add_chunk(high, low, l, i, kc)
    low.flush()
    np.save(os.path.join(index_dir, "kmer_ef_high.npy"), high)

    # verify a few chunks against the d32 plane before deleting it
    z = {"ef_low": np.load(os.path.join(index_dir, "kmer_ef_low.npy"),
                           mmap_mode="r"),
         "ef_high": np.load(os.path.join(index_dir,
                                         "kmer_ef_high.npy"),
                            mmap_mode="r"),
         "ef_l": l, "ef_n": n}
    it_ef = diskfmt.iter_keys_ef(z, chunk=1 << 24)
    for (i0, kd), (i1, ke) in zip(
            _stream_keys(index_dir, meta, chunk=1 << 24), it_ef):
        assert i0 == i1 and np.array_equal(kd, ke), f"mismatch at {i0}"

    meta["kmer_mode"] = "ef"
    meta["kmer_ef_l"] = int(l)
    meta["kmer_ef_n"] = int(n)
    with open(info_path, "w") as fh:
        json.dump(meta, fh, indent=2, default=str)
    for f in ("kmer_d32.npy", "kmer_esc_idx.npy", "kmer_esc_val.npy"):
        os.remove(os.path.join(index_dir, f))
    print(f"{index_dir}: migrated to EF keys in "
          f"{time.time() - t0:.0f}s "
          f"({size_d32 / 2**30:.2f} -> {size_ef / 2**30:.2f} GiB)")


if __name__ == "__main__":
    migrate(sys.argv[1])
