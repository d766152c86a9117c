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

from salmon_tpu.constants import SalmonDefaults  # noqa: F401
