"""Multi-host (multi-process) quantification support.

Reference analog: SURVEY §2.11 distributed backend. The reference is a
single-node thread-pool program; salmon_tpu scales across hosts with
jax.distributed: every process owns a slice of the TPU pod (or virtual
CPU devices in tests), the device mesh spans all processes, and the
mapping step runs as ONE global shard_map program per super-batch:

  * reads: each process streams its own chunk of every super-batch
    (process p contributes rows [p*R, (p+1)*R) via
    jax.make_array_from_process_local_data — no cross-host read IO),
  * fixed-size statistics (counters, FLD, online mass) psum over the
    global mesh and come back replicated,
  * variable-size eq-class tables accumulate per-host and are merged
    once at the end with a process_allgather + vectorized dedupe, so
    every process finishes with the identical table and the (replicated)
    EM produces identical abundances everywhere; process 0 writes.

Launch: scripts/launch_multihost.py, or set SALMON_TPU_COORDINATOR,
SALMON_TPU_NUM_PROCS, SALMON_TPU_PROC_ID and run the normal CLI on every
host.
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger("salmon_tpu")

_ENV_COORD = "SALMON_TPU_COORDINATOR"
_ENV_NPROC = "SALMON_TPU_NUM_PROCS"
_ENV_PID = "SALMON_TPU_PROC_ID"


def maybe_init_from_env() -> bool:
    """Initialize jax.distributed from SALMON_TPU_* env vars (no-op when
    they are absent). Returns True when running multi-process."""
    coord = os.environ.get(_ENV_COORD)
    if not coord:
        return False
    import jax
    nproc = int(os.environ[_ENV_NPROC])
    pid = int(os.environ[_ENV_PID])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    logger.info("jax.distributed initialized: process %d/%d, %d global "
                "devices", pid, nproc, len(jax.devices()))
    return True


def process_info():
    import jax
    return jax.process_index(), jax.process_count()


def make_global_batch(mesh, local_batch: dict) -> dict:
    """Assemble a globally-sharded batch from per-process local rows.

    Every process passes its own (R_local, ...) arrays; the result is a
    (R_local * nprocs, ...) jax.Array sharded along the reads axis over
    the full mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("reads"))
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in local_batch.items()}


def local_rows(arr) -> np.ndarray:
    """The rows of a reads-sharded global array owned by this process."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start
                    if isinstance(s.index, tuple) and s.index else 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def replicated_value(arr):
    """Host value of a fully-replicated global array."""
    return np.asarray(arr.addressable_shards[0].data)


def allgather_eq_state(keys: np.ndarray, counts: np.ndarray,
                       wsum: np.ndarray):
    """Gather every process's (collapsed) eq-table chunks and return the
    concatenation (identical on all processes). Shapes may differ per
    process; rows are padded to the global max and trimmed after."""
    import jax
    from jax.experimental import multihost_utils as mhu

    n_local = keys.shape[0]
    k_cols = keys.shape[1] if keys.size else 0
    w_cols = wsum.shape[1] if wsum.size else 0
    meta = mhu.process_allgather(
        np.array([n_local, k_cols, w_cols], np.int64))
    meta = np.asarray(meta).reshape(-1, 3)
    n_max = int(meta[:, 0].max())
    kc = int(meta[:, 1].max())
    wc = int(meta[:, 2].max())
    if n_max == 0:
        return (np.zeros((0, kc), np.int32), np.zeros(0),
                np.zeros((0, wc)))

    def pad2(a, cols, dtype):
        out = np.zeros((n_max, cols), dtype)
        if a.size:
            out[:a.shape[0], :a.shape[1]] = a
        return out

    keys_g = np.asarray(mhu.process_allgather(
        pad2(keys, kc, np.int32), tiled=False))
    counts_g = np.asarray(mhu.process_allgather(
        np.pad(counts.astype(np.float64), (0, n_max - n_local))))
    wsum_g = np.asarray(mhu.process_allgather(
        pad2(wsum, wc, np.float64)))
    keys_all, counts_all, wsum_all = [], [], []
    for p in range(meta.shape[0]):
        n = int(meta[p, 0])
        keys_all.append(keys_g[p, :n])
        counts_all.append(counts_g[p, :n])
        wsum_all.append(wsum_g[p, :n])
    return (np.concatenate(keys_all), np.concatenate(counts_all),
            np.concatenate(wsum_all))


def allreduce_histograms(arrays):
    """Sum a list of fixed-shape float64 host histograms across
    processes (mergeObservedBias analog — the reference merges
    per-worker-thread BiasParams, WorkerRuntimeContext.hpp:22-70; here
    the workers are processes). Bit-exact: payloads travel as uint32
    views so the gather cannot downcast float64 to float32."""
    from jax.experimental import multihost_utils as mhu

    flat = np.concatenate([np.asarray(a, np.float64).ravel()
                           for a in arrays])
    bits = flat.view(np.uint32)                 # (2 * n,) lossless
    g = np.asarray(mhu.process_allgather(bits, tiled=False))
    tot = g.view(np.float64).reshape(g.shape[0], -1).sum(axis=0)
    out, pos = [], 0
    for a in arrays:
        n = int(np.prod(np.shape(a)))
        out.append(tot[pos:pos + n].reshape(np.shape(a)))
        pos += n
    return out
