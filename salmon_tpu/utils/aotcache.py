"""Opt-in AOT executable cache (SALMON_TPU_AOT_CACHE=dir).

On the axon TPU backend the first jit compile of the mapping program
costs 3-8 minutes PER PROCESS and the XLA persistent compilation cache
does not rehydrate — a real operational cost for short quant jobs. When
SALMON_TPU_AOT_CACHE points at a directory, compiled executables are
serialized there (jax.experimental.serialize_executable) keyed by
(jax version, backend kind, salmon_tpu version, a caller-supplied
signature) and re-loaded by later processes, skipping XLA entirely.

Every failure path (backend refuses serialization, version/topology
drift, corrupt blob) falls back silently to the normal jit compile —
the feature can never make a run incorrect, only faster. The cache key
does NOT hash the source code: bump SALMON_TPU_AOT_VERSION (or clear
the directory) after changing the compute path.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle

logger = logging.getLogger("salmon_tpu")


def cache_dir() -> str | None:
    return os.environ.get("SALMON_TPU_AOT_CACHE") or None


def _key(signature: str) -> str:
    import jax

    from salmon_tpu import __version__
    raw = "|".join([
        jax.__version__,
        jax.devices()[0].device_kind,
        str(len(jax.devices())),
        __version__,
        os.environ.get("SALMON_TPU_AOT_VERSION", "0"),
        signature,
    ])
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


def _probe(comp, call_args):
    """Execute the deserialized executable once and FORCE a readback —
    some backends deserialize successfully but fail at execution (the
    error only surfaces when a result buffer is read, because dispatch
    is async)."""
    import jax
    import numpy as np
    out = comp(*call_args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)                      # blocking; raises on failure


def compile_cached(jitted, signature: str, lower_args: tuple,
                   call_args: tuple):
    """Return a compiled executable for `jitted`, loading it from /
    saving it to the AOT cache when enabled. `lower_args` are the full
    jit arguments (including statics); `call_args` the dynamic-only
    arguments used to probe a deserialized executable end-to-end.
    Returns None when caching is disabled or unsupported (caller uses
    the normal jit path)."""
    d = cache_dir()
    if not d:
        return None
    from jax.experimental import serialize_executable as se

    path = os.path.join(d, _key(signature) + ".aot")
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                blob, in_tree, out_tree = pickle.load(fh)
            comp = se.deserialize_and_load(blob, in_tree, out_tree)
            _probe(comp, call_args)
            logger.info("AOT cache hit: %s", os.path.basename(path))
            return comp
        except Exception as e:  # corrupt/incompatible: fall through
            logger.warning("AOT cache load failed (%s); recompiling",
                           str(e).splitlines()[0] if str(e) else e)
    try:
        comp = jitted.lower(*lower_args).compile()
        blob, in_tree, out_tree = se.serialize(comp)
        # verify the ROUND TRIP executes before storing — XLA:CPU (for
        # one) serializes executables it cannot re-load and run
        comp2 = se.deserialize_and_load(blob, in_tree, out_tree)
        _probe(comp2, call_args)
        os.makedirs(d, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            pickle.dump((blob, in_tree, out_tree), fh)
        os.replace(tmp, path)
        logger.info("AOT cache store: %s (%.1f MB)",
                    os.path.basename(path),
                    os.path.getsize(path) / 1e6)
        return comp
    except Exception as e:
        logger.warning("AOT serialization unsupported here (%s); using "
                       "the normal jit path",
                       str(e).splitlines()[0] if str(e) else e)
        return None
