"""Device-side two-choice bucket hash lookup (the SSHash-query
replacement).

The table layout is built host-side by salmon_tpu.index.hashtable: one
(8 x int32) row per 4-slot bucket, [fpcnt, start] interleaved per slot,
each key living in one of its two candidate buckets. A query is TWO
32-byte row gathers (this backend's efficient gather granule) plus
eight branch-free fingerprint compares — no data-dependent control
flow, no probe chain, and no separate start-plane gather: the matching
slot's occurrence-CSR start rides in the same row.

Reference analog: pufferfish MemCollector's streaming SSHash dictionary
queries (consumed at src/quant/SalmonQuantify.cpp:1266-1275).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SLOTS_PER_BUCKET = 4


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


@functools.partial(jax.jit, static_argnums=(3, 4))
def hash_lookup(hi, lo, tab_rows, n_slots: int,
                max_probes: int = 2 * SLOTS_PER_BUCKET):
    """Look up canonical k-mers in the two-choice bucket table.

    The table ships as ONE (n_buckets, 8) int32 matrix of 4-slot
    buckets with [fpcnt, start] interleaved per slot: a 32-byte row is
    this backend's efficient gather granule, and keeping each slot's
    CSR start in the bucket row makes the whole query TWO row gathers
    (the previous 8-slot/two-plane layout needed a third gather into a
    separate start plane — ~50% more HBM-latency-bound row fetches at
    human-scale table sizes where a random row costs ~15 ns).

    Args:
      hi, lo: (...,) uint32 query key planes.
      tab_rows: (n_buckets, 8) int32 bucket rows
        (slot s at lanes [2s] = fp16<<16 | count16, [2s+1] = CSR start).
      n_slots: total slot count = n_buckets * 4 (static).
      max_probes: slots examined per query (static; = 8, both buckets).

    Returns (start, count, found, inl, itxp, ipf):
      start/count: occurrence CSR range (start=-1/count=0 when not
        found; start=-2 for inlined slots);
      inl: slot stores its single record inline (start-lane bit 31;
        payload47 = txp << 29 | pf across count16 + the start lane's
        low 31 bits — see index.hashtable build_hash_table);
      itxp/ipf: the decoded inline record (undefined when ~inl).
    """
    n_buckets = n_slots // SLOTS_PER_BUCKET
    mask = jnp.uint32(n_buckets - 1)
    b1 = (mix32(hi, lo) & mask).astype(jnp.int32)
    b2 = (mix32b(hi, lo) & mask).astype(jnp.int32)
    fp = fingerprint16(hi, lo)
    r1 = jax.lax.bitcast_convert_type(
        jnp.take(tab_rows, b1, axis=0, mode="clip"), jnp.uint32)
    r2 = jax.lax.bitcast_convert_type(
        jnp.take(tab_rows, b2, axis=0, mode="clip"), jnp.uint32)
    f1 = r1[..., 0::2]
    f2 = r2[..., 0::2]
    m1 = ((f1 >> jnp.uint32(16)) == fp[..., None]) & (f1 != 0)
    m2 = ((f2 >> jnp.uint32(16)) == fp[..., None]) & (f2 != 0)
    in1 = m1.any(axis=-1)
    found = in1 | m2.any(axis=-1)
    # both rows are already here — no third gather for the starts
    row = jnp.where(in1[..., None], r1, r2)
    match = jnp.where(in1[..., None], m1, m2)
    fpcnt = row[..., 0::2]
    st = row[..., 1::2]
    # first matching slot wins (independent-hash fingerprint ties are
    # ~1/65k, but a masked sum would corrupt on one)
    start = jnp.full(b1.shape, -1, jnp.int32)
    count = jnp.zeros(b1.shape, jnp.int32)
    inl = jnp.zeros(b1.shape, bool)
    itxp = jnp.zeros(b1.shape, jnp.int32)
    ipf = jnp.zeros(b1.shape, jnp.int32)
    P = min(max_probes, 2 * SLOTS_PER_BUCKET)
    for p in range(min(P, SLOTS_PER_BUCKET) - 1, -1, -1):
        m = match[..., p]
        stp = st[..., p]
        fcp = fpcnt[..., p]
        is_inl = (stp >> jnp.uint32(31)) == 1
        low31 = (stp & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        hi16 = (fcp & jnp.uint32(0xFFFF)).astype(jnp.int32)
        # CSR starts are int32 >= 0 by builder contract, so the uint32
        # lanes reinterpret losslessly via astype
        start = jnp.where(
            m, jnp.where(is_inl, jnp.int32(-2), stp.astype(jnp.int32)),
            start)
        count = jnp.where(
            m, jnp.where(is_inl, jnp.int32(1), hi16), count)
        inl = jnp.where(m, is_inl, inl)
        itxp = jnp.where(m & is_inl, (hi16 << 2) | (low31 >> 29), itxp)
        ipf = jnp.where(m & is_inl, low31 & jnp.int32((1 << 29) - 1),
                        ipf)
    return start, count, found, inl, itxp, ipf
