"""Multi-device (virtual 8-CPU mesh) parity tests: the sharded map/EM paths
must produce the same results as the single-device paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salmon_tpu.constants import DEFAULTS
from salmon_tpu.index.builder import build_index
from salmon_tpu.inference import em as em_mod
from salmon_tpu.inference.eqclasses import EquivalenceClassAccumulator
from salmon_tpu.mapping.pipeline import (MapperConfig, device_index_arrays,
                                         map_paired_batch)
from salmon_tpu.models.fld import FragmentLengthDistribution
from salmon_tpu.parallel import (make_mesh, parallel_map_paired,
                                 run_em_sharded)
from salmon_tpu.utils import libformat
from salmon_tpu.io.fastq import pack_seqs


def _mk_batch(rng, idx, n_pairs, read_len=76, frag_len=200, R=64):
    """Simulate perfect paired reads from random transcripts."""
    from salmon_tpu.utils.dna import decode_seq, revcomp_codes
    s1, s2 = [], []
    for _ in range(n_pairs):
        tid = rng.integers(0, idx.num_valid_targets)
        codes = idx.transcript_codes(tid)
        L = codes.shape[0]
        fl = min(frag_len, L)
        start = rng.integers(0, L - fl + 1)
        left = codes[start:start + read_len]
        right = revcomp_codes(codes[start + fl - read_len:start + fl])
        s1.append(decode_seq(left).encode())
        s2.append(decode_seq(right).encode())
    c1, l1 = pack_seqs(s1, R, read_len)
    c2, l2 = pack_seqs(s2, R, read_len)
    return {"codes_l": jnp.asarray(c1), "lengths_l": jnp.asarray(l1),
            "codes_r": jnp.asarray(c2), "lengths_r": jnp.asarray(l2)}


@pytest.fixture(scope="module")
def small_index(sample_data_dir):
    import os
    return build_index(os.path.join(sample_data_dir, "transcripts.fasta"),
                       k=25)


def test_parallel_map_matches_single(small_index, rng):
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    idx = small_index
    cfg = MapperConfig.from_index(idx)
    dev = device_index_arrays(idx)
    batch = _mk_batch(rng, idx, n_pairs=48)

    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    out_1 = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
    out_n = parallel_map_paired(mesh, batch, dev, cfg, fld_logpmf, cp, co)

    for k in ("num_processed", "num_mapped", "num_paired", "num_orphans"):
        assert int(out_1[k]) == int(out_n[k]), k
    np.testing.assert_allclose(np.asarray(out_1["txp_mass"]),
                               np.asarray(out_n["txp_mass"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_1["fld_hist"]),
                                  np.asarray(out_n["fld_hist"]))
    # per-read sharded outputs concatenate back to the same global tensor
    np.testing.assert_array_equal(np.asarray(out_1["eq_txp"]),
                                  np.asarray(out_n["eq_txp"]))


def test_sharded_em_matches_single(small_index, rng):
    mesh = make_mesh(8)
    idx = small_index
    cfg = MapperConfig.from_index(idx)
    dev = device_index_arrays(idx)
    batch = _mk_batch(rng, idx, n_pairs=64)
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))
    out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)

    acc = EquivalenceClassAccumulator()
    acc.add_batch(np.asarray(out["eq_txp"]), np.asarray(out["eq_weight"]),
                  np.asarray(out["eq_bins"]))
    eq = acc.finish()
    assert eq.num_classes > 0

    n = idx.num_valid_targets
    eff = np.maximum(idx.lengths[:n].astype(np.float64) - 150.0, 1.0)
    eqd, _ = em_mod.pad_eqclasses(eq, pad_multiple=256)

    a0 = em_mod.initial_alphas(n, None, eq.num_fragments)
    pri = em_mod.prior_alphas(n, eff, 1e-2, True)
    args = (jnp.asarray(a0, jnp.float32), jnp.asarray(pri, jnp.float32),
            n, True, 0.01, 50, 1000)
    alpha_1, it_1, _, _, _ = em_mod.run_em(
        eqd, *args, eff_lens=jnp.asarray(eff, jnp.float32))
    alpha_n, it_n, _ = run_em_sharded(
        mesh, eqd, args[0], args[1], n, True, 0.01, 50, 1000,
        eff_lens=jnp.asarray(eff, jnp.float32))
    assert int(it_1) == int(it_n)
    np.testing.assert_allclose(np.asarray(alpha_1), np.asarray(alpha_n),
                               rtol=1e-4, atol=1e-3)
