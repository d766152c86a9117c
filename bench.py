"""Benchmark: selective-alignment mapping throughput on the current chip.

Prints ONE JSON line:
  {"metric": "reads/s/chip", "value": N, "unit": "fragments/s",
   "vs_baseline": N}

Measures the DEFAULT production configuration: full DP-validated
selective alignment (validateMappings on, like the reference). Set
BENCH_VALIDATE=0 for the coverage-only path.

vs_baseline is measured throughput divided by an assumed reference-salmon
throughput of 5e5 fragments/s on a 32-core CPU node (the reference publishes
no absolute numbers — BASELINE.md; 5e5 frags/s is a conservative estimate of
salmon selective alignment at 32 threads). North-star: vs_baseline >= 5.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "tests", "data")
BASELINE_FRAGS_PER_S = 5.0e5

TARGET_PAIRS = int(os.environ.get("BENCH_PAIRS", 131072))
BATCH = int(os.environ.get("BENCH_BATCH", 4096))
VALIDATE = os.environ.get("BENCH_VALIDATE", "1") != "0"


def main():
    import jax
    import jax.numpy as jnp

    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.index.builder import build_index
    from salmon_tpu.io.fastq import _iter_fastq_seqs, pack_seqs
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays,
                                             map_paired_batch)
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat

    dev_kind = jax.devices()[0].device_kind
    print(f"# bench device: {dev_kind}", file=sys.stderr)

    idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
    cfg = MapperConfig.from_index(idx, validate_mappings=VALIDATE)
    dev = device_index_arrays(idx)

    reads1 = list(_iter_fastq_seqs(os.path.join(DATA, "reads_1.fastq")))
    reads2 = list(_iter_fastq_seqs(os.path.join(DATA, "reads_2.fastq")))
    read_len = max(len(s) for s in reads1 + reads2)

    # pre-pack the whole sample once, then tile batches from it (host IO is
    # excluded: this measures the device mapping pipeline, the reference's
    # fragments/s metric-of-record is likewise mapping-loop throughput)
    c1, l1 = pack_seqs(reads1, len(reads1), read_len)
    c2, l2 = pack_seqs(reads2, len(reads2), read_len)
    n = len(reads1)
    reps = -(-BATCH // n)
    c1 = np.tile(c1, (reps, 1))[:BATCH]
    l1 = np.tile(l1, reps)[:BATCH]
    c2 = np.tile(c2, (reps, 1))[:BATCH]
    l2 = np.tile(l2, reps)[:BATCH]
    batch = {"codes_l": jnp.asarray(c1), "lengths_l": jnp.asarray(l1),
             "codes_r": jnp.asarray(c2), "lengths_r": jnp.asarray(l2)}

    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    # warmup / compile
    out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
    jax.block_until_ready(out["txp_mass"])
    mapped_frac = float(out["num_mapped"]) / float(out["num_processed"])
    print(f"# mapped fraction: {mapped_frac:.4f}", file=sys.stderr)

    n_batches = max(1, TARGET_PAIRS // BATCH)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
    jax.block_until_ready(out["txp_mass"])
    dt = time.perf_counter() - t0
    frags_per_s = n_batches * BATCH / dt

    print(json.dumps({
        "metric": "reads/s/chip",
        "value": round(frags_per_s, 1),
        "unit": "fragments/s",
        "vs_baseline": round(frags_per_s / BASELINE_FRAGS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
