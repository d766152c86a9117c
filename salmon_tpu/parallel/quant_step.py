"""Multi-chip data-parallel quantification step.

The reference parallelizes with N identical worker threads over disjoint
read batches sharing a read-only index (SURVEY.md §2.11 item 2,
src/quant/SalmonQuantify.cpp:2460-2468). The TPU-native equivalent is pure
data parallelism over the reads axis of each fixed-shape batch:

  * the index lives replicated in every chip's HBM,
  * each device maps its shard of the batch with the same jitted program,
  * fixed-size sufficient statistics (per-transcript online mass, FLD
    histogram, library-format histogram, counters) are merged with `psum`
    over ICI — the collective replacing the reference's thread-local
    BiasParams merge (WorkerRuntimeContext.hpp:22-70) and atomic adds,
  * the variable eq-class label tensors stay sharded by reads and are
    gathered by the host accumulator (exactly like the reference's
    per-thread eq-class upserts into one builder).

This module is mesh-shape agnostic: it works on 1 real TPU chip, on an
N-device virtual CPU mesh, and on a multi-host slice (devices spanning
hosts; jax.make_mesh handles placement).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from salmon_tpu.mapping.pipeline import (MapperConfig, map_paired_batch_impl,
                                         map_single_batch_impl)

READS_AXIS = "reads"

# per-batch outputs that are fixed-size statistics -> psum-merged
_PSUM_KEYS = ("txp_mass", "fld_hist", "fmt_hist", "num_processed",
              "num_mapped", "num_paired", "num_orphans",
              "num_orphans_rescued", "num_decoy_fragments",
              "num_dovetail_fragments", "num_frags_filtered_vm",
              "num_alns_below_threshold", "seed_tail_over")
# everything else (eq tensors, best-hit fields) stays sharded by reads


def make_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the reads (data-parallel) axis."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (READS_AXIS,))


def shard_batch_arrays(mesh: Mesh, batch: dict) -> dict:
    """Place host batch arrays sharded along the reads axis."""
    sh = NamedSharding(mesh, P(READS_AXIS))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def _merge(out: dict) -> dict:
    merged = {}
    for k, v in out.items():
        if k in _PSUM_KEYS:
            merged[k] = jax.lax.psum(v, READS_AXIS)
        else:
            merged[k] = v
    return merged


@functools.partial(jax.jit, static_argnums=(0, 3))
def _paired_stepped(mesh, batch, dev, cfg, fld_logpmf, cp, co):
    raw = lambda b: map_paired_batch_impl(b, dev, cfg, fld_logpmf, cp, co)
    fn = lambda b: _merge(raw(b))
    spec_in = {k: P(READS_AXIS) for k in batch}
    out_keys = jax.eval_shape(raw, batch).keys()
    spec_out = {k: (P() if k in _PSUM_KEYS else P(READS_AXIS))
                for k in out_keys}
    return shard_map(fn, mesh=mesh, in_specs=(spec_in,),
                     out_specs=spec_out)(batch)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _single_stepped(mesh, batch, dev, cfg, fld_logpmf, cs):
    raw = lambda b: map_single_batch_impl(b, dev, cfg, fld_logpmf, cs)
    fn = lambda b: _merge(raw(b))
    spec_in = {k: P(READS_AXIS) for k in batch}
    out_keys = jax.eval_shape(raw, batch).keys()
    spec_out = {k: (P() if k in _PSUM_KEYS else P(READS_AXIS))
                for k in out_keys}
    return shard_map(fn, mesh=mesh, in_specs=(spec_in,),
                     out_specs=spec_out)(batch)


def parallel_map_paired(mesh: Mesh, batch: dict, dev: dict,
                        cfg: MapperConfig, fld_logpmf, compat_paired,
                        compat_orphan) -> dict:
    """Map one paired batch data-parallel over the mesh.

    `batch` rows must be divisible by the mesh size (pad with zero-length
    rows — the pipeline already ignores them).
    """
    return _paired_stepped(mesh, batch, dev, cfg, fld_logpmf,
                           compat_paired, compat_orphan)


def parallel_map_single(mesh: Mesh, batch: dict, dev: dict,
                        cfg: MapperConfig, fld_logpmf, compat_single) -> dict:
    return _single_stepped(mesh, batch, dev, cfg, fld_logpmf, compat_single)
