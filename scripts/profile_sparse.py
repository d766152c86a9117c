"""Sparse vs dense seed-flow profiling on the real chip.

Usage:  python scripts/profile_sparse.py [sample|human] [R ...]
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
DATA = os.path.join(HERE, "tests", "data")
CACHE = os.environ.get(
    "BENCH_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                "salmon_tpu_bench"))


def bench(fn, *args, reps=5, warmup=1):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def log(msg):
    print(msg, flush=True)


def load_batch(r1, r2, R):
    import jax.numpy as jnp
    from salmon_tpu.io.fastq import _iter_fastq_seqs, pack_seqs
    reads1 = list(_iter_fastq_seqs(r1))
    reads2 = list(_iter_fastq_seqs(r2))
    L = max(len(s) for s in reads1 + reads2)
    c1, l1 = pack_seqs(reads1, len(reads1), L)
    c2, l2 = pack_seqs(reads2, len(reads2), L)
    reps = -(-R // len(reads1))
    return {
        "codes_l": jnp.asarray(np.tile(c1, (reps, 1))[:R]),
        "lengths_l": jnp.asarray(np.tile(l1, reps)[:R]),
        "codes_r": jnp.asarray(np.tile(c2, (reps, 1))[:R]),
        "lengths_r": jnp.asarray(np.tile(l2, reps)[:R]),
    }


def main():
    import jax
    import jax.numpy as jnp
    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.index.builder import build_index, load_index
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays,
                                             map_paired_batch)
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat

    which = sys.argv[1] if len(sys.argv) > 1 else "sample"
    Rs = [int(a) for a in sys.argv[2:]] or [4096, 16384]

    log(f"# device: {jax.devices()[0].device_kind}")
    if which == "human":
        idx = load_index(os.path.join(CACHE, "hs_idx"))
        r1 = os.path.join(CACHE, "reads_1.fastq")
        r2 = os.path.join(CACHE, "reads_2.fastq")
    else:
        idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
        r1 = os.path.join(DATA, "reads_1.fastq")
        r2 = os.path.join(DATA, "reads_2.fastq")
    dev = device_index_arrays(idx)
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fldl = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    for R in Rs:
        batch = load_batch(r1, r2, R)
        for sparse in (True, False):
            cfg = MapperConfig.from_index(idx, sparse_seed=sparse)
            f = lambda b: map_paired_batch(b, dev, cfg, fldl, cp, co)
            out = f(batch)
            mf = float(out["num_mapped"]) / float(out["num_processed"])
            ms = bench(f, batch, reps=5)
            log(f"R={R} sparse={int(sparse)}: {ms:.1f} ms -> "
                f"{R / (ms / 1e3):,.0f} frags/s (mapped {mf:.4f})")

    # stage timing: seed stage alone (both ends), sparse vs dense
    R = Rs[-1]
    batch = load_batch(r1, r2, R)
    from salmon_tpu.mapping.pipeline import _seed_candidates
    for sparse in (True, False):
        cfg = MapperConfig.from_index(idx, sparse_seed=sparse)
        g = jax.jit(lambda b: _seed_candidates(
            [b["codes_l"], b["codes_r"]],
            [b["lengths_l"], b["lengths_r"]], dev, cfg))
        ms = bench(g, batch, reps=5)
        log(f"seed stage R={R} sparse={int(sparse)}: {ms:.1f} ms")


if __name__ == "__main__":
    main()
