"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


SAMPLE_TRANSCRIPTS = os.path.join(os.path.dirname(__file__), "data",
                                  "transcripts.fasta")
SAMPLE_READS_1 = os.path.join(os.path.dirname(__file__), "data",
                              "reads_1.fastq")
SAMPLE_READS_2 = os.path.join(os.path.dirname(__file__), "data",
                              "reads_2.fastq")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


def random_seq(rng, n: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.fixture(scope="session")
def sample_data_dir():
    d = os.path.join(os.path.dirname(__file__), "data")
    if not os.path.exists(os.path.join(d, "transcripts.fasta")):
        pytest.skip("sample data not present (tests/data)")
    return d
