"""AOT executable cache (utils/aotcache.py): store/load round trip,
probe-gated trust, and graceful degradation."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salmon_tpu.utils import aotcache


@functools.partial(jax.jit, static_argnums=(1,))
def _toy(x, scale):
    return jnp.sort(x * scale, axis=0) + jnp.cumsum(x)


def test_disabled_returns_none(monkeypatch):
    monkeypatch.delenv("SALMON_TPU_AOT_CACHE", raising=False)
    assert aotcache.compile_cached(_toy, "sig", (jnp.ones(8), 2),
                                   (jnp.ones(8),)) is None


def test_store_then_load_round_trip(tmp_path, monkeypatch):
    monkeypatch.setenv("SALMON_TPU_AOT_CACHE", str(tmp_path))
    x = jnp.arange(16.0)
    comp = aotcache.compile_cached(_toy, "toy-16", (x, 3), (x,))
    if comp is None:
        pytest.skip("backend cannot serialize executables")
    want = np.asarray(_toy(x, 3))
    np.testing.assert_allclose(np.asarray(comp(x)), want)
    # a second resolution must LOAD (blob present) and agree
    files = list(tmp_path.glob("*.aot"))
    assert len(files) == 1
    comp2 = aotcache.compile_cached(_toy, "toy-16", (x, 3), (x,))
    assert comp2 is not None
    np.testing.assert_allclose(np.asarray(comp2(x)), want)


def test_corrupt_blob_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("SALMON_TPU_AOT_CACHE", str(tmp_path))
    x = jnp.arange(8.0)
    comp = aotcache.compile_cached(_toy, "toy-8", (x, 2), (x,))
    if comp is None:
        pytest.skip("backend cannot serialize executables")
    blob = list(tmp_path.glob("*.aot"))[0]
    blob.write_bytes(b"garbage")
    comp2 = aotcache.compile_cached(_toy, "toy-8", (x, 2), (x,))
    assert comp2 is not None  # recompiled despite the corrupt file
    np.testing.assert_allclose(np.asarray(comp2(x)),
                               np.asarray(_toy(x, 2)))


def test_key_depends_on_signature_and_version(monkeypatch):
    assert aotcache._key("a") != aotcache._key("b")
    k0 = aotcache._key("a")
    monkeypatch.setenv("SALMON_TPU_AOT_VERSION", "7")
    assert aotcache._key("a") != k0
