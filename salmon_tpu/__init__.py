"""salmon_tpu — a TPU-native transcript quantification engine.

A from-scratch reimplementation of the capabilities of COMBINE-lab/salmon
(reference: /root/reference, v1.11.4) designed TPU-first:

- the k-mer index lives as packed HBM tensors (fixed-probe open-addressing
  hash table over canonical k-mers, in the spirit of SSHash/pufferfish but
  branch-free-gather friendly instead of MPHF pointer-chasing),
- selective alignment runs as a batched, fixed-shape seed→score→join
  pipeline under jit (reference hot loop: src/quant/SalmonQuantify.cpp
  processReads), with a Pallas banded-DP extension kernel,
- equivalence classes are built by sort + segment-reduction instead of a
  concurrent cuckoo hash (reference: EquivalenceClassBuilder.hpp),
- the collapsed EM/VBEM optimizer (reference:
  src/inference/CollapsedEMOptimizer.cpp) is jitted linear algebra over
  CSR-packed equivalence classes,
- multi-chip scaling is pure data parallelism over read batches with psum
  merges of sufficient statistics (jax.sharding Mesh + shard_map).
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: first-compile of the mapping
    pipeline runs minutes on the TPU backend; cached recompiles are
    seconds. Opt out with SALMON_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("SALMON_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        d = _os.environ.get(
            "SALMON_TPU_COMPILE_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "salmon_tpu_xla"))
        # partition by platform: executables cached under a TPU-plugin
        # session must not be loaded into pure-CPU processes (machine
        # feature mismatch -> potential SIGILL)
        d = _os.path.join(
            d, _os.environ.get("JAX_PLATFORMS", "default") or "default")
        _os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from salmon_tpu.constants import SalmonDefaults  # noqa: F401
