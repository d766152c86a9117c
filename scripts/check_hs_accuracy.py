"""Human-scale mapping accuracy: map the bench cache's truth-labeled
reads (names encode readnum:txp:fragstart:fraglen) against the
200k-transcript synthetic index and report the fraction of mapped
fragments whose eq-class label set contains the true transcript.

Usage: [JAX_PLATFORMS=cpu] python scripts/check_hs_accuracy.py [N_BATCHES]
(CPU works — slow but exact; TPU preferred.)
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
CACHE = os.environ.get(
    "BENCH_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                "salmon_tpu_bench"))

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.index.builder import load_index
    from salmon_tpu.io.fastq import iter_paired_chunks
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays,
                                             map_paired_batch)
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    R = int(os.environ.get("BENCH_BATCH", 4096))
    idx_dir = os.path.join(CACHE, "hs_idx")
    r1 = os.path.join(CACHE, "reads_1.fastq")
    r2 = os.path.join(CACHE, "reads_2.fastq")
    t0 = time.time()
    idx = load_index(idx_dir)
    print(f"# index: {idx.num_targets} txps, "
          f"{idx.kmers.shape[0] / 1e6:.0f}M kmers, "
          f"loaded {time.time() - t0:.0f}s", file=sys.stderr, flush=True)
    name_to_id = {nm: i for i, nm in enumerate(idx.names)}

    cfg = MapperConfig.from_index(idx)
    dev = device_index_arrays(idx)
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    n_frag = n_hit = n_mapped = 0
    chunks = iter_paired_chunks([r1], [r2], R, DEFAULTS.max_read_len,
                                want_names=True)
    t0 = time.time()
    for bi, chunk in enumerate(chunks):
        if bi >= n_batches:
            break
        batch = {"codes_l": jnp.asarray(chunk.left.codes),
                 "lengths_l": jnp.asarray(chunk.left.lengths),
                 "codes_r": jnp.asarray(chunk.right.codes),
                 "lengths_r": jnp.asarray(chunk.right.lengths)}
        out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
        eq = np.asarray(out["eq_txp"])
        names = chunk.left.names
        for r in range(chunk.n_valid):
            true_t = name_to_id.get(
                names[r].decode().split(":")[1], -1)
            labels = eq[r][eq[r] < 2**31 - 1]
            n_frag += 1
            if labels.size:
                n_mapped += 1
                n_hit += bool((labels == true_t).any())
        print(f"# batch {bi}: cum mapped {n_mapped}/{n_frag}, "
              f"true-in-labelset {n_hit}/{n_mapped} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    print({"fragments": n_frag,
           "mapped_frac": round(n_mapped / max(n_frag, 1), 4),
           "true_in_labels_frac": round(n_hit / max(n_mapped, 1), 4)})


if __name__ == "__main__":
    main()
