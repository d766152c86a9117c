"""Migrate a v3 on-disk index (8-slot, 16-wide table rows) to v4
(4-slot, 8-wide rows) in place, without re-enumerating k-mers.

The occurrence CSR proper (records [0, occ_offsets[-1])) is identical
across versions; only the hash-table rows and the shadow-merge appendix
(records past occ_offsets[-1], derived from the table) change. So:
truncate the occ arrays at occ_offsets[-1], rebuild the table with the
current build_hash_table, re-append the new appendix, bump the version.

Usage: python scripts/migrate_index_v4.py <index_dir>
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from salmon_tpu.index.builder import INDEX_FORMAT_VERSION  # noqa: E402
from salmon_tpu.index.hashtable import (appendix_plan,  # noqa: E402
                                        build_hash_table)


def migrate(index_dir: str) -> None:
    info_path = os.path.join(index_dir, "info.json")
    with open(info_path) as fh:
        meta = json.load(fh)
    ver = meta.get("index_format_version")
    if ver == INDEX_FORMAT_VERSION:
        print(f"{index_dir}: already v{INDEX_FORMAT_VERSION}")
        return
    if ver != 3:
        raise SystemExit(f"can only migrate v3 -> v4, found v{ver}")
    if not int(meta.get("table_n_slots", 0)):
        # table-less (sharded-only) index: nothing layout-dependent
        meta["index_format_version"] = INDEX_FORMAT_VERSION
        with open(info_path, "w") as fh:
            json.dump(meta, fh, indent=2, default=str)
        print(f"{index_dir}: table-less, version stamped to v4")
        return

    t0 = time.time()
    kmers = np.load(os.path.join(index_dir, "kmers.npy"))
    offsets = np.load(os.path.join(index_dir, "occ_offsets.npy"))
    tx = np.load(os.path.join(index_dir, "occ_txp.npy"))
    po = np.load(os.path.join(index_dir, "occ_pos.npy"))
    fw = np.load(os.path.join(index_dir, "occ_fwd.npy"))
    n_csr = int(offsets[-1])
    print(f"{index_dir}: {kmers.shape[0]} keys, {n_csr} CSR records "
          f"({tx.shape[0] - n_csr} old appendix records dropped)")
    tx, po, fw = tx[:n_csr].copy(), po[:n_csr].copy(), fw[:n_csr].copy()

    table = build_hash_table(kmers, occ_offsets=offsets)
    print(f"table rebuilt in {time.time() - t0:.0f}s: "
          f"n_slots={table.n_slots} evicted={table.n_evicted} "
          f"shadowed={table.n_shadowed}")
    if table.n_shadowed:
        is_sep, gi, sep_fp = appendix_plan(table)
        tx = np.concatenate([tx, np.where(is_sep, -1, tx[gi])
                             .astype(np.int32)])
        po = np.concatenate([po, np.where(is_sep, sep_fp, po[gi])
                             .astype(np.int32)])
        fw = np.concatenate([fw, np.where(is_sep, False, fw[gi])])

    np.save(os.path.join(index_dir, "occ_txp.npy"), tx)
    np.save(os.path.join(index_dir, "occ_pos.npy"), po)
    np.save(os.path.join(index_dir, "occ_fwd.npy"), fw)
    np.save(os.path.join(index_dir, "table_rows.npy"), table.rows)
    meta.update({
        "index_format_version": INDEX_FORMAT_VERSION,
        "table_n_slots": table.n_slots,
        "table_max_probes": table.max_probes,
        "num_occurrences": int(tx.shape[0]),
    })
    with open(info_path, "w") as fh:
        json.dump(meta, fh, indent=2, default=str)
    print(f"{index_dir}: migrated to v4 in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    migrate(sys.argv[1])
