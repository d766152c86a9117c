"""Patch a v5 index's table rows to inline single-occurrence records
(index.hashtable build_hash_table inline_records) without any rebuild.

Pure row transform: slots with count16 == 1 (never shadow-merge owners
— those carry block totals >= 3) read their record at the slot's CSR
start and rewrite to the inline encoding when txp/pf fit the 18/29-bit
payload split. Sets info.json table_inline_singles.

Usage: python scripts/migrate_index_inline.py <index_dir>
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def migrate(index_dir: str) -> None:
    t0 = time.time()
    info_path = os.path.join(index_dir, "info.json")
    with open(info_path) as fh:
        meta = json.load(fh)
    if meta.get("index_format_version") != 5:
        raise SystemExit("inline patch expects a v5 index")
    if meta.get("table_inline_singles"):
        print(f"{index_dir}: already inlined")
        return
    if not int(meta.get("table_n_slots", 0)):
        meta["table_inline_singles"] = False
        with open(info_path, "w") as fh:
            json.dump(meta, fh, indent=2, default=str)
        print(f"{index_dir}: table-less; nothing to inline "
              "(per-shard tables inline at load)")
        return

    rows = np.load(os.path.join(index_dir, "table_rows.npy"))
    fpcnt = rows[:, 0::2].view(np.uint32)
    starts = rows[:, 1::2]
    cand = ((fpcnt & np.uint32(0xFFFF)) == 1) & (fpcnt != 0) \
        & (starts >= 0)
    cb, cs = np.nonzero(cand)
    st = starts[cb, cs].astype(np.int64)
    if meta.get("occ_mode", "raw") == "occ48":
        # occ48 indexes store (n, 3) u16 records — decode the candidate
        # rows via the memmap slice (r4 advisor: hard-loading
        # occ_txp/occ_pf crashed here)
        from salmon_tpu.index import diskfmt
        packed = np.load(os.path.join(index_dir, "occ48.npy"),
                         mmap_mode="r")
        txr, pfr = diskfmt.unpack_occ48(
            np.asarray(packed[st]),
            sep_halved=meta.get("occ48_sep_halved", False))
        txr = txr.astype(np.int64)
        pfr = pfr.astype(np.int64)
    else:
        tx = np.load(os.path.join(index_dir, "occ_txp.npy"),
                     mmap_mode="r")
        pf = np.load(os.path.join(index_dir, "occ_pf.npy"),
                     mmap_mode="r")
        txr = np.asarray(tx[st], np.int64)
        pfr = np.asarray(pf[st], np.int64)
    ok = ((txr >= 0) & (txr < (1 << 18))
          & (pfr >= 0) & (pfr < (1 << 29) - 1))
    fp = fpcnt[cb, cs] >> np.uint32(16)
    payload_hi = (txr >> 2).astype(np.uint32)
    fpcnt_new = (fp << np.uint32(16)) | payload_hi
    ok &= fpcnt_new != 0
    cb, cs = cb[ok], cs[ok]
    low31 = (((txr[ok] & 3).astype(np.uint32) << np.uint32(29))
             | pfr[ok].astype(np.uint32))
    rows[cb, 2 * cs] = fpcnt_new[ok].view(np.int32)
    rows[cb, 2 * cs + 1] = (np.uint32(0x80000000) | low31).view(np.int32)
    np.save(os.path.join(index_dir, "table_rows.npy"), rows)
    meta["table_inline_singles"] = True
    with open(info_path, "w") as fh:
        json.dump(meta, fh, indent=2, default=str)
    print(f"{index_dir}: inlined {cb.shape[0]} single-occurrence slots "
          f"in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    migrate(sys.argv[1])
