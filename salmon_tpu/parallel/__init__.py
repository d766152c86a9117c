"""Multi-device / multi-host parallel execution.

Lazy exports: importing this package must NOT touch jax (the
distributed submodule has to run jax.distributed.initialize before the
backend is first initialized, and sibling modules create jnp constants
at import time).
"""

_EXPORTS = {
    "make_mesh": "salmon_tpu.parallel.quant_step",
    "parallel_map_paired": "salmon_tpu.parallel.quant_step",
    "parallel_map_single": "salmon_tpu.parallel.quant_step",
    "shard_batch_arrays": "salmon_tpu.parallel.quant_step",
    "run_em_sharded": "salmon_tpu.parallel.em",
    "distributed": "salmon_tpu.parallel.distributed",
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib
        mod = importlib.import_module(_EXPORTS[name])
        if name == "distributed":
            return mod
        return getattr(mod, name)
    raise AttributeError(name)
