"""Migrate a v4 on-disk index to the v5 compact layout in place,
WITHOUT rebuilding the hash table (~47 min at human scale).

v5 = compact planes (index.diskfmt) + oct-aligned CSR. The alignment
moves every key's start, but old starts are sorted (CSR), so the table
rows' start payloads remap with one searchsorted; appendix records
(past the CSR end) shift by the total pad count.

Usage: python scripts/migrate_index_v5.py <index_dir>
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from salmon_tpu.index.builder import (INDEX_FORMAT_VERSION,  # noqa: E402
                                      TranscriptomeIndex, save_index)
from salmon_tpu.index.diskfmt import oct_align_csr  # noqa: E402
from salmon_tpu.index.hashtable import KmerHashTable  # noqa: E402


def migrate(index_dir: str) -> None:
    t0 = time.time()
    with open(os.path.join(index_dir, "info.json")) as fh:
        meta = json.load(fh)
    ver = meta.get("index_format_version")
    if ver == INDEX_FORMAT_VERSION:
        print(f"{index_dir}: already v{INDEX_FORMAT_VERSION}")
        return
    if ver != 4:
        raise SystemExit(f"can only migrate v4 -> v5, found v{ver} "
                         "(v3: run migrate_index_v4.py first)")

    def L(name):
        return np.load(os.path.join(index_dir, f"{name}.npy"))

    with open(os.path.join(index_dir, "ref_names.txt")) as fh:
        names = [ln.rstrip("\n") for ln in fh if ln.rstrip("\n")]
    kmers = L("kmers")
    off = L("occ_offsets").astype(np.int64)
    tx = L("occ_txp")
    pf = ((L("occ_pos").astype(np.int64) << 1)
          | L("occ_fwd")).astype(np.int32)
    n_csr = int(off[-1])
    tail_tx, tail_pf = tx[n_csr:], pf[n_csr:]     # appendix region
    counts = np.diff(off)
    new_off, (atx, apf) = oct_align_csr(
        off, (tx[:n_csr], pf[:n_csr]), (np.int32(-1), np.int32(0)))
    new_total = int(new_off[-1])
    atx = np.concatenate([atx, tail_tx])
    apf = np.concatenate([apf, tail_pf])
    print(f"{index_dir}: aligned {n_csr} -> {new_total} records "
          f"(+{100.0 * (new_total - n_csr) / max(n_csr, 1):.1f}% pads), "
          f"{tail_tx.shape[0]} appendix records shifted")

    table = None
    if int(meta.get("table_n_slots", 0)):
        rows = L("table_rows").copy()
        fpcnt = rows[:, 0::2].view(np.uint32)
        starts = rows[:, 1::2]
        live = fpcnt != 0
        s_old = starts[live].astype(np.int64)
        in_csr = s_old < n_csr
        old_starts = off[:-1]
        ki = np.searchsorted(old_starts, s_old[in_csr])
        if not np.array_equal(old_starts[ki], s_old[in_csr]):
            raise SystemExit("table start not found at a key boundary — "
                             "refusing to remap; rebuild instead")
        s_new = s_old.copy()
        s_new[in_csr] = new_off[:-1][ki]
        s_new[~in_csr] += new_total - n_csr        # appendix shift
        starts[live] = s_new.astype(np.int32)
        table = KmerHashTable(rows=rows,
                              n_slots=int(meta["table_n_slots"]),
                              max_probes=int(meta["table_max_probes"]))

    meta["occ_oct_aligned"] = True
    idx = TranscriptomeIndex(
        k=int(meta["k"]), names=names, lengths=L("lengths"),
        complete_lengths=L("complete_lengths"),
        first_decoy_index=int(meta["first_decoy_index"]),
        kmers=kmers, occ_offsets=new_off, occ_txp=atx, occ_pf=apf,
        table=table, seq_codes=L("seq_codes"),
        seq_offsets=L("seq_offsets"), info=meta, occ_counts=counts)
    tmp = index_dir.rstrip("/") + ".v5tmp"
    save_index(idx, tmp)
    # swap: keep a minimal window where the dir is incomplete
    for f in os.listdir(index_dir):
        os.remove(os.path.join(index_dir, f))
    for f in os.listdir(tmp):
        os.replace(os.path.join(tmp, f), os.path.join(index_dir, f))
    shutil.rmtree(tmp)
    print(f"{index_dir}: migrated to v5 in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    migrate(sys.argv[1])
