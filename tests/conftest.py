"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

# force CPU for tests (the ambient env may point at a real TPU); the
# virtual 8-device mesh exercises all sharding paths
if not os.environ.get("SALMON_TPU_TEST_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# CLI version check (cli._version_message) would pay its 2 s offline
# timeout on every CLI-invoking test
os.environ.setdefault("SALMON_NO_VERSION_CHECK", "1")

import jax  # noqa: E402

if not os.environ.get("SALMON_TPU_TEST_DEVICE"):
    # belt-and-braces: the axon TPU plugin can win over the env var
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


SAMPLE_TRANSCRIPTS = os.path.join(os.path.dirname(__file__), "data",
                                  "transcripts.fasta")
SAMPLE_READS_1 = os.path.join(os.path.dirname(__file__), "data",
                              "reads_1.fastq")
SAMPLE_READS_2 = os.path.join(os.path.dirname(__file__), "data",
                              "reads_2.fastq")


@pytest.fixture(scope="module", autouse=True)
def _release_jit_mappings():
    """Drop compiled executables between test modules.

    Each loaded XLA:CPU executable holds O(1000) small JIT code
    mappings (one triplet per thunk); across the full suite's many
    program variants the process crosses the kernel's 65530
    vm.max_map_count and segfaults inside the compiler. clear_caches()
    releases them, and the persistent compile cache makes the reload
    cheap.
    """
    yield
    jax.clear_caches()


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
