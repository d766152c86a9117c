"""K-mer-sharded index: host-side shard partitioning correctness and
device-side parity of the sharded mapping path vs single-device (virtual
8-CPU mesh, 2 reads x 4 kmer shards)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salmon_tpu.constants import DEFAULTS
from salmon_tpu.index.builder import build_index
from salmon_tpu.index.hashtable import lookup_host, split_u64
from salmon_tpu.index.shard import shard_index_arrays, shard_owner
from salmon_tpu.mapping.pipeline import (MapperConfig, device_index_arrays,
                                         map_paired_batch)
from salmon_tpu.models.fld import FragmentLengthDistribution
from salmon_tpu.parallel.sharded import (device_sharded_index,
                                         make_sharded_mesh,
                                         sharded_map_paired)
from salmon_tpu.utils import libformat
from tests.test_parallel import _mk_batch


@pytest.fixture(scope="module")
def small_index(sample_data_dir):
    return build_index(os.path.join(sample_data_dir, "transcripts.fasta"),
                       k=25)


def test_shard_partition_is_exact(small_index):
    """Every key is found in exactly its owner shard, with the same
    occurrence records (in order) as the global CSR."""
    idx = small_index
    S = 4
    sh = shard_index_arrays(idx, S)
    assert sh.n_shards == S and sh.n_evicted == 0
    hi, lo = split_u64(idx.kmers)
    owner = shard_owner(hi, lo, sh.shard_bits)

    from salmon_tpu.index.hashtable import KmerHashTable
    rng = np.random.default_rng(7)
    pick = rng.choice(idx.kmers.shape[0], size=min(500, idx.kmers.shape[0]),
                      replace=False)
    occ_flat = sh.occ_oct.reshape(S, -1, 2)
    for s in range(S):
        tab = KmerHashTable(rows=sh.tab_rows[s], n_slots=sh.n_slots)
        start, count, itxp, ipf = lookup_host(tab, idx.kmers[pick],
                                              decode_inline=True)
        for j, ki in enumerate(pick):
            g0 = idx.occ_offsets[ki]
            g1 = g0 + idx.occ_counts[ki]   # offsets carry align pads
            if owner[ki] == s:
                want = np.stack(
                    [idx.occ_txp[g0:g1],
                     (idx.occ_pos[g0:g1].astype(np.int64) << 1
                      | idx.occ_fwd[g0:g1]).astype(np.int32)], axis=1)
                if start[j] == -2:      # inlined single-occurrence slot
                    assert want.shape[0] == 1 and count[j] == 1
                    assert itxp[j] == want[0, 0], ki
                    assert ipf[j] == want[0, 1], ki
                    continue
                # fingerprint-shadow-merged slots return a block that
                # CONTAINS the key's records as a contiguous run (see
                # hashtable docstring); unmerged slots return exactly
                assert count[j] >= g1 - g0
                got = occ_flat[s, start[j]:start[j] + count[j]]
                runs = [o for o in range(got.shape[0] - want.shape[0] + 1)
                        if np.array_equal(got[o:o + want.shape[0]], want)]
                assert runs, (ki, got, want)


def test_sharded_map_matches_single(small_index, rng):
    """With no hit-budget truncation the sharded path is bit-identical
    to the single-device sparse path."""
    assert len(jax.devices()) == 8
    idx = small_index
    # budget high enough that neither path truncates hits
    cfg = MapperConfig.from_index(idx, seed_hits_per_end=512)
    dev1 = device_index_arrays(idx)
    batch = _mk_batch(rng, idx, n_pairs=48)

    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    out_1 = map_paired_batch(batch, dev1, cfg, fld_logpmf, cp, co)

    mesh = make_sharded_mesh(n_kmer_shards=4)
    assert mesh.shape == {"reads": 2, "kmer": 4}
    sdev, over = device_sharded_index(idx, mesh)
    scfg = dataclasses.replace(cfg, n_slots=over["n_slots"],
                               sparse_seed=True)
    out_s = sharded_map_paired(mesh, batch, sdev, scfg,
                               over["shard_bits"], fld_logpmf, cp, co)

    for k in ("num_processed", "num_mapped", "num_paired", "num_orphans"):
        assert int(out_1[k]) == int(out_s[k]), k
    assert int(out_1["num_mapped"]) > 40
    np.testing.assert_array_equal(np.asarray(out_1["eq_txp"]),
                                  np.asarray(out_s["eq_txp"]))
    np.testing.assert_allclose(np.asarray(out_1["txp_mass"]),
                               np.asarray(out_s["txp_mass"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_1["fld_hist"]),
                                  np.asarray(out_s["fld_hist"]))


def test_quantify_with_sharded_index(small_index, sample_data_dir):
    """End-to-end quantify with --indexShards 4 reproduces the default
    multi-device run on the bundled sample."""
    from salmon_tpu.constants import SalmonDefaults
    from salmon_tpu.quant import quantify

    r1 = [os.path.join(sample_data_dir, "reads_1.fastq")]
    r2 = [os.path.join(sample_data_dir, "reads_2.fastq")]
    o = SalmonDefaults()
    o.reads_per_batch = 4096
    # the sharded path is built on the sparse seed flow; its parity
    # claim is bit-identical seeding vs the SPARSE single-device run
    # (the default dense flow differs by ~1% on multimapper weighting)
    o.sparse_seed = True
    base = quantify(small_index, "IU", r1, r2, opts=o, progress=False)

    o2 = SalmonDefaults()
    o2.reads_per_batch = 4096
    o2.index_shards = 4
    shard = quantify(small_index, "IU", r1, r2, opts=o2, progress=False)

    assert shard.num_mapped == base.num_mapped == 10000
    # post-gather re-budgeting (seed_sparse.rebudget_hits) makes the
    # sharded seeding bit-identical to single-device at any budget, so
    # quantification must agree to float tolerance
    np.testing.assert_allclose(shard.counts, base.counts,
                               rtol=1e-4, atol=0.02)


def test_iter_shard_arrays_matches_inram(tmp_path, monkeypatch):
    """Streamed v5 sharding (index.shard.iter_shard_arrays — the
    genome-scale config-5 load path) produces per-shard tables and
    occurrence planes bit-identical to the in-RAM shard_index_arrays of
    the loaded index. Also CI-covers the partitioned table-less build
    path at toy scale (VERDICT r4 next #2/#6)."""
    import os
    import numpy as np
    from salmon_tpu.index import builder as bmod
    from salmon_tpu.index.builder import build_index, save_index, \
        load_index
    from salmon_tpu.index.shard import (iter_shard_arrays,
                                        shard_index_arrays)
    fa = os.path.join(os.path.dirname(__file__), "data",
                      "transcripts.fasta")
    # force the partitioned TABLE-LESS path at toy scale
    monkeypatch.setattr(bmod, "TABLE_DIRECT_MAX_KEYS", 1)
    idx = build_index(fa, k=25, partition_bits=2, max_occs_kept=4)
    assert idx.table is None and idx.info.get("requires_shards")
    d = str(tmp_path / "tl_idx")
    save_index(idx, d)
    idx2 = load_index(d)
    want = shard_index_arrays(idx2, 4)
    got = list(iter_shard_arrays(d, 4, load_factor=0.5,
                                 max_load_factor=0.62))
    assert len(got) == 4
    occ_cat = want.occ_oct.reshape(4, -1, 2)
    for s, meta, sh in got:
        assert sh["n_slots"] == want.n_slots
        np.testing.assert_array_equal(sh["tab_rows"],
                                      want.tab_rows[s])
        n_s = sh["occ_txp"].shape[0]
        np.testing.assert_array_equal(sh["occ_txp"],
                                      occ_cat[s, :n_s, 0])
        np.testing.assert_array_equal(sh["occ_pf"],
                                      occ_cat[s, :n_s, 1])
        assert not occ_cat[s, n_s:, 0].any()
