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
    """Look up canonical k-mers in the packed compact probe table.

    The table interleaves TWO 8-byte slots (fpcnt, start) per 16-byte row
    (index.hashtable), so the `max_probes` candidate slots arrive in
    max_probes/2 + 1 row gathers; a parity select aligns the slot window.
    Verification is by the 16-bit fingerprint in fpcnt's high half — a
    ~1/65k false positive yields another k-mer's occurrences, which the
    chain scorer / DP validation discard downstream.

    Args:
      hi, lo: (...,) uint32 query key planes.
      table_rows: (ceil((n_slots + max_probes)/2), 4) int32 slot pairs.
      n_slots: power-of-two logical table size (static).
      max_probes: probe bound (static).

    Returns (start, count, found): occurrence CSR range (start=-1/count=0
    when not found).
    """
    mixed = mix32(hi, lo)
    slot0 = (mixed & jnp.uint32(n_slots - 1)).astype(jnp.int32)
    fp = mixed >> jnp.uint32(16)
    P = max_probes
    n_rows = P // 2 + 1
    r0 = slot0 >> 1
    ridx = r0[..., None] + jnp.arange(n_rows, dtype=jnp.int32)
    rows = jnp.take(table_rows, ridx, axis=0,
                    mode="clip")                  # (..., n_rows, 4)
    pairs = rows.reshape(*rows.shape[:-2], n_rows * 2, 2)
    # align the window to the probe start's parity
    par_odd = (slot0 & 1)[..., None] == 1
    fpcnt = jax.lax.bitcast_convert_type(
        jnp.where(par_odd, pairs[..., 1:P + 1, 0], pairs[..., 0:P, 0]),
        jnp.uint32)
    start_w = jnp.where(par_odd, pairs[..., 1:P + 1, 1],
                        pairs[..., 0:P, 1])
    match = ((fpcnt >> jnp.uint32(16)) == fp[..., None]) & (fpcnt != 0)
    found = match.any(axis=-1)
    # first matching probe wins (fingerprint ties are possible, unlike
    # the exact-key layout, so a masked sum would corrupt)
    start = jnp.full(slot0.shape, -1, jnp.int32)
    count = jnp.zeros(slot0.shape, jnp.int32)
    for p in range(P - 1, -1, -1):
        m = match[..., p]
        start = jnp.where(m, start_w[..., p], start)
        count = jnp.where(
            m, (fpcnt[..., p] & jnp.uint32(0xFFFF)).astype(jnp.int32),
            count)
    return start, count, found
