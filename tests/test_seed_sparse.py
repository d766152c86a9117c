"""Parity of the batch-global sparse seed flow vs the dense path.

The sparse flow (mapping.seed_sparse) must reproduce the dense
(R, P, C) expansion's candidate scoring when its per-end hit budget
covers every hit — identical co-linear run scores, min-diagonals, and
downstream eq-class mass on the bundled sample.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from salmon_tpu.constants import DEFAULTS
from salmon_tpu.index.builder import build_index
from salmon_tpu.io.fastq import _iter_fastq_seqs, pack_seqs
from salmon_tpu.mapping.pipeline import (MapperConfig,
                                         device_index_arrays,
                                         map_paired_batch)
from salmon_tpu.models.fld import FragmentLengthDistribution
from salmon_tpu.utils import libformat

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def sample_setup():
    idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
    reads1 = list(_iter_fastq_seqs(os.path.join(DATA, "reads_1.fastq")))
    reads2 = list(_iter_fastq_seqs(os.path.join(DATA, "reads_2.fastq")))
    L = max(len(s) for s in reads1 + reads2)
    R = 256
    c1, l1 = pack_seqs(reads1, len(reads1), L)
    c2, l2 = pack_seqs(reads2, len(reads2), L)
    reps = -(-R // len(reads1))
    batch = {
        "codes_l": jnp.asarray(np.tile(c1, (reps, 1))[:R]),
        "lengths_l": jnp.asarray(np.tile(l1, reps)[:R]),
        "codes_r": jnp.asarray(np.tile(c2, (reps, 1))[:R]),
        "lengths_r": jnp.asarray(np.tile(l2, reps)[:R]),
    }
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fldl = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))
    return idx, batch, fldl, cp, co


def _run(idx, batch, fldl, cp, co, **over):
    cfg = MapperConfig.from_index(idx, **over)
    dev = device_index_arrays(idx)
    return map_paired_batch(batch, dev, cfg, fldl, cp, co)


def test_sparse_matches_dense_end_to_end(sample_setup):
    idx, batch, fldl, cp, co = sample_setup
    dense = _run(idx, batch, fldl, cp, co, sparse_seed=False)
    sparse = _run(idx, batch, fldl, cp, co, sparse_seed=True)
    assert int(dense["num_mapped"]) == int(sparse["num_mapped"])
    assert int(dense["num_paired"]) == int(sparse["num_paired"])
    np.testing.assert_allclose(np.asarray(dense["txp_mass"]),
                               np.asarray(sparse["txp_mass"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dense["best_txp"]),
                                  np.asarray(sparse["best_txp"]))


def test_sparse_candidates_match_dense(sample_setup):
    """Candidate dicts themselves (txp/score/diag sets per read)."""
    idx, batch, fldl, cp, co = sample_setup
    from salmon_tpu.mapping.pipeline import _seed_candidates

    dev = device_index_arrays(idx)
    out = {}
    for sparse in (False, True):
        cfg = MapperConfig.from_index(idx, sparse_seed=sparse)
        out[sparse] = _seed_candidates(
            [batch["codes_l"], batch["codes_r"]],
            [batch["lengths_l"], batch["lengths_r"]], dev, cfg)
    for e in range(2):
        cd, _ = out[False][e]
        cs, _ = out[True][e]
        R = cd["txp"].shape[0]
        for r in range(R):
            def canon(c):
                m = np.asarray(c["valid"][r])
                rows = {(int(t), bool(f), int(s), int(d))
                        for t, f, s, d in zip(
                            np.asarray(c["txp"][r])[m],
                            np.asarray(c["is_fw"][r])[m],
                            np.asarray(c["score"][r])[m],
                            np.asarray(c["min_diag"][r])[m])}
                return rows
            assert canon(cd) == canon(cs), f"end {e} read {r}"


def test_sparse_budget_truncation_keeps_leftmost():
    """A tiny budget must keep the leftmost windows' hits and still
    produce valid candidates (graceful degradation, not corruption)."""
    idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
    reads1 = list(_iter_fastq_seqs(os.path.join(DATA, "reads_1.fastq")))
    reads2 = list(_iter_fastq_seqs(os.path.join(DATA, "reads_2.fastq")))
    L = max(len(s) for s in reads1 + reads2)
    R = 64
    c1, l1 = pack_seqs(reads1, len(reads1), L)
    c2, l2 = pack_seqs(reads2, len(reads2), L)
    reps = -(-R // len(reads1))
    batch = {
        "codes_l": jnp.asarray(np.tile(c1, (reps, 1))[:R]),
        "lengths_l": jnp.asarray(np.tile(l1, reps)[:R]),
        "codes_r": jnp.asarray(np.tile(c2, (reps, 1))[:R]),
        "lengths_r": jnp.asarray(np.tile(l2, reps)[:R]),
    }
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fldl = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))
    out = _run(idx, batch, fldl, cp, co, sparse_seed=True,
               seed_hits_per_end=4)
    # every sample read is unique-mapping with hits in its first windows
    assert int(out["num_mapped"]) == R


def test_diag_bucket_bits_never_overflow_key():
    """key2 = diag_bucket << window_bits must fit uint32 for any
    transcript-local diagonal up to the index's max transcript length
    (64Mb+ decoy chromosomes coarsen the bands instead of wrapping)."""
    from salmon_tpu.mapping.score import DIAG_OFFSET, diag_bucket_bits_for
    for max_tpos in (1000, 100_000, 1 << 20, 64_000_000, 250_000_000,
                     2_000_000_000):
        for wb in (8, 9, 10, 11, 12):
            b = diag_bucket_bits_for(max_tpos, wb)
            assert b >= 5
            db_max = (max_tpos + DIAG_OFFSET) >> b
            assert db_max < (1 << (32 - wb)), (max_tpos, wb, b)
            # and not needlessly coarse: one fewer bit would overflow
            # (unless already at the floor)
            if b > 5:
                assert ((max_tpos + DIAG_OFFSET) >> (b - 1)) \
                    >= (1 << (32 - wb))


def test_row_pool_expand_parity():
    """expand_occurrences row_pool=P (budget covers every window) must
    reproduce the unpooled expand bit-for-bit; a tight budget only
    drops records (ovalid) and counts the overflow."""
    import numpy as np
    import jax.numpy as jnp
    from salmon_tpu.mapping.score import expand_occurrences

    rng = np.random.default_rng(5)
    R, P, C = 64, 12, 8
    F = R * P
    n_oct = 4096
    occ = jnp.asarray(rng.integers(0, 2**20, (n_oct, 16),
                                   dtype=np.int64).astype(np.int32))
    start = jnp.asarray((rng.integers(0, n_oct - 2, (R, P),
                                      dtype=np.int64) * 8).astype(
        np.int32))
    count = jnp.asarray(np.minimum(
        1 + rng.geometric(0.6, (R, P)), 8).astype(np.int32))
    found = jnp.asarray(rng.random((R, P)) < 0.9)
    inl = jnp.asarray(rng.random((R, P)) < 0.7) & found
    itxp = jnp.asarray(rng.integers(0, 1000, (R, P),
                                    dtype=np.int64).astype(np.int32))
    ipf = jnp.asarray(rng.integers(0, 2**18, (R, P),
                                   dtype=np.int64).astype(np.int32))
    km = {
        "hi": jnp.asarray(rng.integers(0, 2**32, (R, P),
                                       dtype=np.int64).astype(
            np.uint32)),
        "lo": jnp.asarray(rng.integers(0, 2**32, (R, P),
                                       dtype=np.int64).astype(
            np.uint32)),
        "valid": jnp.asarray(np.ones((R, P), bool)),
        "is_fw": jnp.asarray(rng.random((R, P)) < 0.5),
    }
    lk = (start, count, found, inl, itxp, ipf)
    base = expand_occurrences(km, lk, occ, C, 1000, stride=6,
                              tail_frac=64)
    pooled = expand_occurrences(km, lk, occ, C, 1000, stride=6,
                                tail_frac=64, row_pool=P)
    for a, b in zip(base[:4], pooled[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(pooled[4]) == int(base[4])
    # tight budget: valid hits shrink but never grow; overflow counted;
    # and every SERVED lane carries the exact unpooled record (guards
    # the un-sort permutation — a rank-compacting un-sort fabricates
    # records on the wrong windows, r5 review finding)
    tight = expand_occurrences(km, lk, occ, C, 1000, stride=6,
                               tail_frac=64, row_pool=2)
    ov_base = np.asarray(base[3])
    ov_tight = np.asarray(tight[3])
    assert not (ov_tight & ~ov_base).any()
    assert int(tight[4]) > 0
    for a, b in zip(base[:3], tight[:3]):
        np.testing.assert_array_equal(np.asarray(a)[ov_tight],
                                      np.asarray(b)[ov_tight])


def test_row_pool_quant_wiring(monkeypatch, tmp_path):
    """SALMON_TPU_ROWPOOL with a full budget quantifies bit-identically
    (guards the pipeline wiring; the budget semantics themselves are
    covered by test_row_pool_expand_parity)."""
    import os
    import numpy as np
    from salmon_tpu.constants import SalmonDefaults
    from salmon_tpu.index.builder import build_index
    from salmon_tpu.quant import quantify

    data = os.path.join(os.path.dirname(__file__), "data")
    fa = os.path.join(data, "transcripts.fasta")
    r1 = [os.path.join(data, "reads_1.fastq")]
    r2 = [os.path.join(data, "reads_2.fastq")]
    o = SalmonDefaults()
    o.reads_per_batch = 4096
    idx = build_index(fa, k=25)
    assert idx.info.get("table_inline_singles")
    base = quantify(idx, "IU", r1, r2, opts=o, progress=False)
    monkeypatch.setenv("SALMON_TPU_ROWPOOL", "64")
    pooled = quantify(idx, "IU", r1, r2, opts=o, progress=False)
    assert base.num_mapped == pooled.num_mapped
    np.testing.assert_array_equal(base.counts, pooled.counts)
