"""Native FASTQ reader: parity with the pure-Python path + throughput
sanity."""

import gzip
import os
import time

import numpy as np
import pytest

from salmon_tpu.io import fastq as fq


@pytest.fixture(autouse=True)
def require_native():
    if fq._native_lib() is None:
        pytest.skip("native fastq reader unavailable")


def _collect(it):
    out = []
    for ch in it:
        pairs = ch if isinstance(ch, fq.PairedChunk) else None
        out.append(ch)
    return out


def test_native_matches_python_single(sample_data_dir):
    p = os.path.join(sample_data_dir, "reads_1.fastq")
    nat = list(fq.iter_single_chunks([p], 4096, 256))
    py = list(fq._iter_single_chunks_py([p], 4096, 256))
    assert len(nat) == len(py)
    total_n = total_p = 0
    for a, b in zip(nat, py):
        assert a.n_valid == b.n_valid
        La, Lb = a.codes.shape[1], b.codes.shape[1]
        L = min(La, Lb)
        np.testing.assert_array_equal(a.codes[:, :L], b.codes[:, :L])
        np.testing.assert_array_equal(a.lengths, b.lengths)
        total_n += a.n_valid
    assert total_n == 10000


def test_native_paired_and_names(sample_data_dir):
    p1 = os.path.join(sample_data_dir, "reads_1.fastq")
    p2 = os.path.join(sample_data_dir, "reads_2.fastq")
    chunks = list(fq.iter_paired_chunks([p1], [p2], 3000, 256,
                                        want_names=True))
    assert sum(c.n_valid for c in chunks) == 10000
    first = chunks[0].left
    assert first.names is not None
    assert first.names[0].split(b":")[0] == b"1"


def test_native_gzip_and_fasta(tmp_path):
    fa = tmp_path / "r.fasta.gz"
    with gzip.open(fa, "wt") as fh:
        for i in range(100):
            fh.write(f">r{i}\nACGTACGTAC\nGTACGT\n")
    chunks = list(fq.iter_single_chunks([str(fa)], 64, 64))
    assert sum(c.n_valid for c in chunks) == 100
    c0 = chunks[0]
    assert int(c0.lengths[0]) == 16
    np.testing.assert_array_equal(
        c0.codes[0, :16],
        np.array([0, 1, 2, 3] * 4, dtype=np.uint8))


def test_native_throughput(sample_data_dir):
    p = os.path.join(sample_data_dir, "reads_1.fastq")
    t0 = time.perf_counter()
    n = 0
    for _ in range(10):
        for ch in fq.iter_single_chunks([p], 8192, 64):
            n += ch.n_valid
    dt = time.perf_counter() - t0
    rate = n / dt
    assert rate > 200_000, f"native reader too slow: {rate:.0f} reads/s"
