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


@functools.partial(jax.jit, static_argnums=(5, 6))
def hash_lookup(hi, lo, table_hi, table_lo, table_payload,
                n_slots: int, max_probes: int):
    """Look up canonical k-mers in the probe table.

    All `max_probes` candidate slots are gathered in ONE wide gather per
    table plane (slots are consecutive, slot0..slot0+P-1) and the first
    match is selected with an argmax — no chained per-probe gathers, which
    keeps the XLA gather graph shallow (compile time) and lets the probe
    axis ride the vector lanes (runtime).

    Args:
      hi, lo: (...,) uint32 query key planes.
      table_hi/table_lo/table_payload: (n_slots + max_probes,) table planes.
      n_slots: power-of-two logical table size (static).
      max_probes: probe bound (static).

    Returns (row, found): payload row index (int32, garbage when not found)
    and bool found mask. Queries whose hi plane is >= 2^31 never match
    (the empty sentinel is 0xFFFFFFFF), so callers can mask invalid windows
    by leaving them as-is and AND-ing with their own validity.
    """
    slot0 = (mix32(hi, lo) & jnp.uint32(n_slots - 1)).astype(jnp.int32)
    probe = jnp.arange(max_probes, dtype=jnp.int32)
    slots = slot0[..., None] + probe  # (..., P) consecutive slots
    t_hi = jnp.take(table_hi, slots, mode="clip")
    t_lo = jnp.take(table_lo, slots, mode="clip")
    match = (t_hi == hi[..., None]) & (t_lo == lo[..., None])
    found = match.any(axis=-1)
    first = jnp.argmax(match, axis=-1)
    pay = jnp.take(table_payload, slots, mode="clip")
    row = jnp.take_along_axis(pay, first[..., None], axis=-1)[..., 0]
    row = jnp.where(found, row, -1)
    return row, found
