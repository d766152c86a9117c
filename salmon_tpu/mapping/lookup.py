"""Device-side two-choice bucket hash lookup (the SSHash-query
replacement).

The table layout is built host-side by salmon_tpu.index.hashtable: one
(16 x int32) row per 8-slot bucket, each key living in one of its two
candidate buckets. A query is TWO row gathers plus sixteen branch-free
fingerprint compares — no data-dependent control flow, no probe chain.

Reference analog: pufferfish MemCollector's streaming SSHash dictionary
queries (consumed at src/quant/SalmonQuantify.cpp:1266-1275).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SLOTS_PER_BUCKET = 8


def mix32(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """First bucket hash — must match
    salmon_tpu.index.hashtable.mix32 bit-for-bit."""
    x = lo ^ (hi * jnp.uint32(0x9E3779B9)) ^ jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


def mix32b(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Second bucket hash — must match hashtable.mix32b bit-for-bit."""
    x = hi ^ (lo * jnp.uint32(0x85EBCA77)) ^ jnp.uint32(0xC2B2AE3D)
    x = x ^ (x >> jnp.uint32(17))
    x = x * jnp.uint32(0xED5AD4BB)
    x = x ^ (x >> jnp.uint32(11))
    x = x * jnp.uint32(0xAC4C1B51)
    x = x ^ (x >> jnp.uint32(15))
    return x


def fingerprint16(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Third-mix 16-bit fingerprint — must match
    hashtable.fingerprint16 bit-for-bit. (A bucket hash's high bits
    share their low bits with the bucket index at human-scale bucket
    counts, so they are NOT a usable fingerprint.)"""
    x = hi ^ (lo * jnp.uint32(0xCC9E2D51)) ^ jnp.uint32(0x1B873593)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0xD168AAAD)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0xAF723597)
    x = x ^ (x >> jnp.uint32(15))
    return x >> jnp.uint32(16)


def fingerprint30(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Fourth-mix 30-bit segment fingerprint — must match
    hashtable.fingerprint30 bit-for-bit. Compared against the separator
    records of shadow-merged occurrence blocks (hashtable docstring)."""
    hi = hi.astype(jnp.uint32)
    lo = lo.astype(jnp.uint32)
    x = lo ^ (hi * jnp.uint32(0x27D4EB2F)) ^ jnp.uint32(0x165667B1)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x >> jnp.uint32(2)


@functools.partial(jax.jit, static_argnums=(4, 5))
def hash_lookup(hi, lo, fp_rows, st_rows, n_slots: int,
                max_probes: int = 2 * SLOTS_PER_BUCKET):
    """Look up canonical k-mers in the two-choice bucket table.

    The table ships as two (n_buckets, 8) PLANES instead of one
    (n_buckets, 16) interleaved row: on this backend 8-wide int32 row
    gathers cost ~3 ns while 16-wide rows jump to ~23 ns (the gather
    granule is 32 bytes), so 2 fingerprint-plane gathers + 1
    start-plane gather of the matching bucket run ~5x faster than 2
    interleaved-row gathers.

    Args:
      hi, lo: (...,) uint32 query key planes.
      fp_rows: (n_buckets, 8) int32 fpcnt plane (fp16<<16 | count16).
      st_rows: (n_buckets, 8) int32 occurrence-CSR start plane.
      n_slots: total slot count = n_buckets * 8 (static).
      max_probes: slots examined per query (static; = 16, both buckets).

    Returns (start, count, found): occurrence CSR range (start=-1/count=0
    when not found).
    """
    n_buckets = n_slots // SLOTS_PER_BUCKET
    mask = jnp.uint32(n_buckets - 1)
    b1 = (mix32(hi, lo) & mask).astype(jnp.int32)
    b2 = (mix32b(hi, lo) & mask).astype(jnp.int32)
    fp = fingerprint16(hi, lo)
    f1 = jax.lax.bitcast_convert_type(
        jnp.take(fp_rows, b1, axis=0, mode="clip"), jnp.uint32)
    f2 = jax.lax.bitcast_convert_type(
        jnp.take(fp_rows, b2, axis=0, mode="clip"), jnp.uint32)
    m1 = ((f1 >> jnp.uint32(16)) == fp[..., None]) & (f1 != 0)
    m2 = ((f2 >> jnp.uint32(16)) == fp[..., None]) & (f2 != 0)
    in1 = m1.any(axis=-1)
    found = in1 | m2.any(axis=-1)
    # the start plane is read once, from whichever bucket matched
    bsel = jnp.where(in1, b1, b2)
    st = jnp.take(st_rows, bsel, axis=0, mode="clip")  # (..., 8)
    match = jnp.where(in1[..., None], m1, m2)
    fpcnt = jnp.where(in1[..., None], f1, f2)
    # first matching slot wins (independent-hash fingerprint ties are
    # ~1/65k, but a masked sum would corrupt on one)
    start = jnp.full(b1.shape, -1, jnp.int32)
    count = jnp.zeros(b1.shape, jnp.int32)
    P = min(max_probes, 2 * SLOTS_PER_BUCKET)
    for p in range(min(P, SLOTS_PER_BUCKET) - 1, -1, -1):
        m = match[..., p]
        start = jnp.where(m, st[..., p], start)
        count = jnp.where(
            m, (fpcnt[..., p] & jnp.uint32(0xFFFF)).astype(jnp.int32),
            count)
    return start, count, found
