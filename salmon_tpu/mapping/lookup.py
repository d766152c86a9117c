"""Device-side bounded-probe hash lookup (the SSHash-query replacement).

The table layout is built host-side by salmon_tpu.index.hashtable; probing
here is an unrolled sequence of gathers — no data-dependent control flow, so
XLA can pipeline it. The probe bound is a static compile-time constant
recorded at index build.

Reference analog: pufferfish MemCollector's streaming SSHash dictionary
queries (consumed at src/quant/SalmonQuantify.cpp:1266-1275).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def mix32(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Murmur3-finalizer hash of a (hi, lo) uint32 key pair.

    Must match salmon_tpu.index.hashtable.mix32 bit-for-bit.
    """
    x = lo ^ (hi * jnp.uint32(0x9E3779B9)) ^ jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


@functools.partial(jax.jit, static_argnums=(3, 4))
def hash_lookup(hi, lo, table_rows, n_slots: int, max_probes: int):
    """Look up canonical k-mers in the packed probe table.

    All `max_probes` candidate slots are fetched with ONE row gather from
    the (H + P, 4) int32 row matrix (hi, lo, occ_start, occ_count) — no
    chained per-probe gathers and no payload indirection, which keeps the
    XLA gather graph shallow (compile time) and fetches each slot's four
    words contiguously (runtime).

    Args:
      hi, lo: (...,) uint32 query key planes.
      table_rows: (n_slots + max_probes, 4) int32 packed table.
      n_slots: power-of-two logical table size (static).
      max_probes: probe bound (static).

    Returns (start, count, found): occurrence CSR range (start=-1/count=0
    when not found). Queries whose hi plane is >= 2^31 never match (the
    empty sentinel is -1), so callers can mask invalid windows by leaving
    them as-is and AND-ing with their own validity.
    """
    slot0 = (mix32(hi, lo) & jnp.uint32(n_slots - 1)).astype(jnp.int32)
    probe = jnp.arange(max_probes, dtype=jnp.int32)
    slots = slot0[..., None] + probe  # (..., P) consecutive slots
    rows = jnp.take(table_rows, slots, axis=0, mode="clip")  # (..., P, 4)
    hi_i = hi.astype(jnp.int32)
    lo_i = lo.astype(jnp.int32)
    match = (rows[..., 0] == hi_i[..., None]) & \
        (rows[..., 1] == lo_i[..., None])
    found = match.any(axis=-1)
    # robin-hood layout stores each key once: select the (unique) matching
    # probe with a masked reduce — cheaper than a take_along_axis gather
    m = match[..., None]
    start = jnp.sum(jnp.where(m, rows[..., 2:3], 0), axis=(-2, -1))
    count = jnp.sum(jnp.where(m, rows[..., 3:4], 0), axis=(-2, -1))
    start = jnp.where(found, start, -1)
    return start, count, found
