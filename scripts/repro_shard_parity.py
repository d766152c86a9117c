"""Scan rng seeds for sharded-vs-single mapping parity failures."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import dataclasses

import jax

# the axon TPU plugin can win over the env var; force CPU explicitly
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from salmon_tpu.constants import DEFAULTS
from salmon_tpu.index.builder import build_index
from salmon_tpu.mapping.pipeline import (MapperConfig, device_index_arrays,
                                         map_paired_batch)
from salmon_tpu.models.fld import FragmentLengthDistribution
from salmon_tpu.parallel.sharded import (device_sharded_index,
                                         make_sharded_mesh,
                                         sharded_map_paired)
from salmon_tpu.utils import libformat

sys.path.insert(0, os.path.join(HERE, "tests"))
from test_parallel import _mk_batch  # noqa: E402

idx = build_index(os.path.join(HERE, "tests", "data", "transcripts.fasta"),
                  k=25)
cfg = MapperConfig.from_index(idx, seed_hits_per_end=512)
dev1 = device_index_arrays(idx)
fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
fmt = libformat.parse_library_format("IU")
cp = jnp.asarray(libformat.paired_compat_table(fmt))
co = jnp.asarray(libformat.orphan_compat_table(fmt))

mesh = make_sharded_mesh(n_kmer_shards=4)
sdev, over = device_sharded_index(idx, mesh)
scfg = dataclasses.replace(cfg, n_slots=over["n_slots"], sparse_seed=True)

for seed in range(int(sys.argv[1]) if len(sys.argv) > 1 else 200):
    rng = np.random.default_rng(seed)
    batch = _mk_batch(rng, idx, n_pairs=48)
    out_1 = map_paired_batch(batch, dev1, cfg, fld_logpmf, cp, co)
    out_s = sharded_map_paired(mesh, batch, sdev, scfg,
                               over["shard_bits"], fld_logpmf, cp, co)
    a = np.asarray(out_1["eq_txp"])
    b = np.asarray(out_s["eq_txp"])
    counts = {k: (int(out_1[k]), int(out_s[k]))
              for k in ("num_mapped", "num_paired", "num_orphans")}
    bad_counts = any(x != y for x, y in counts.values())
    if bad_counts or not np.array_equal(a, b):
        rows = np.nonzero((a != b).any(axis=1))[0]
        print(f"seed {seed}: MISMATCH rows {rows.tolist()} counts {counts}")
        for r in rows[:4]:
            print(f"  row {r}: single {a[r][a[r] < 2**31 - 1].tolist()} "
                  f"sharded {b[r][b[r] < 2**31 - 1].tolist()}")
        sys.exit(1)
print("no mismatch found")
