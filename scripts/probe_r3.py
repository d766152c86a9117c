"""Round-3 throughput probe: per-call timing across configs in ONE
process (compiles are 1-15+ min on the axon tunnel; this logs each
result as it lands).

Usage: python scripts/probe_r3.py [configs...]
  config tokens: R=<batch> sparse=<0|1> W=<n> dpb=<n> pairs=<n>
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402


def log(msg):
    print(msg, flush=True)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.index.builder import build_index
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays,
                                             map_paired_batch)
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat

    sys.path.insert(0, HERE)
    from bench import _load_reads

    log(f"# device: {jax.devices()[0].device_kind}")
    data = os.path.join(HERE, "tests", "data")
    idx = build_index(os.path.join(data, "transcripts.fasta"), k=25)
    dev = device_index_arrays(idx)
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    specs = sys.argv[1:] or ["R=4096", "R=4096,sparse=0", "R=8192",
                             "R=16384"]
    batches = {}
    for spec in specs:
        kv = dict(tok.split("=") for tok in spec.split(","))
        R = int(kv.get("R", 4096))
        over = {}
        if "sparse" in kv:
            over["sparse_seed"] = kv["sparse"] == "1"
        if "W" in kv:
            over["weight_width"] = int(kv["W"])
        if "dpb" in kv:
            over["dp_budget"] = int(kv["dpb"])
        if "B" in kv:
            over["seed_hits_per_end"] = int(kv["B"])
        if "occ" in kv:
            over["occ_cap"] = int(kv["occ"])
        if "stride" in kv:
            over["kmer_stride"] = int(kv["stride"])
        cfg = dataclasses.replace(
            MapperConfig.from_index(idx, validate_mappings=True), **over)
        if R not in batches:
            batches[R] = _load_reads(os.path.join(data, "reads_1.fastq"),
                                     os.path.join(data, "reads_2.fastq"),
                                     R)
        batch = batches[R]
        t0 = time.perf_counter()
        out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
        mf = float(out["num_mapped"]) / float(out["num_processed"])
        t_compile = time.perf_counter() - t0
        log(f"## {spec}: compile+first {t_compile:.1f}s mapped={mf:.4f}")
        # individual calls, each forced to completion
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
            _ = float(out["txp_mass"].sum())
            times.append(time.perf_counter() - t0)
        # pipelined loop (no readback until the end)
        n = max(4, int(kv.get("pairs", 40 * 4096)) // R)
        t0 = time.perf_counter()
        for _ in range(n):
            out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
        _ = float(out["txp_mass"].sum())
        dt = time.perf_counter() - t0
        log(f"## {spec}: single-call ms min={min(times)*1e3:.1f} "
            f"med={sorted(times)[len(times)//2]*1e3:.1f}; "
            f"loop {n}x -> {dt/n*1e3:.1f} ms/batch, "
            f"{n*R/dt:,.0f} frags/s")


if __name__ == "__main__":
    main()
