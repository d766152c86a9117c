"""Device-side canonical k-mer extraction over fixed-shape read batches.

Replaces the per-read streaming k-mer scan of the reference's MemCollector
(external pufferfish; consumed at src/quant/SalmonQuantify.cpp:1266-1275)
with a batched, branch-free computation: every window of every read in a
(R, L) batch is packed into two uint32 planes (hi, lo) — no 64-bit integers
on device — canonicalized against its reverse complement, and masked for
validity (N bases, read bounds).

Packing convention matches salmon_tpu.utils.dna: kmer = big-endian 2-bit
codes; hi = first k-16 bases, lo = last 16 bases (hi = 0 when k <= 16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2,))
def extract_kmers(codes: jax.Array, lengths: jax.Array, k: int):
    """Extract canonical k-mers for every window of a read batch.

    Args:
      codes: (R, L) uint8 base codes (A=0..T=3, >=4 invalid/pad).
      lengths: (R,) int32 actual read lengths.
      k: k-mer length (static, odd, <= 31).

    Returns dict of (R, P) arrays with P = L - k + 1:
      hi, lo: uint32 canonical k-mer planes,
      is_fw:  bool — True if the forward-strand window equals the canonical,
      valid:  bool — window inside the read and free of invalid bases.
    """
    R, L = codes.shape
    P = L - k + 1
    if P <= 0:
        raise ValueError(f"max read length {L} shorter than k={k}")
    c = codes.astype(jnp.uint32)

    n_lo = min(k, 16)
    n_hi = k - n_lo

    def pack(js):
        """Pack bases at window offsets `js` (ascending significance order).

        js are offsets into the window; base at js[0] is most significant.
        Returns (R, P) uint32.
        """
        acc = jnp.zeros((R, P), dtype=jnp.uint32)
        for j in js:
            acc = (acc << jnp.uint32(2)) | jax.lax.dynamic_slice(
                c, (0, j), (R, P))
        return acc

    # forward k-mer: bases window[0..k-1], msb first
    fw_hi = pack(range(0, n_hi)) if n_hi else jnp.zeros((R, P), jnp.uint32)
    fw_lo = pack(range(n_hi, k))

    # reverse complement: "base" i of rc = 3 - window[k-1-i]
    def pack_rc(js):
        acc = jnp.zeros((R, P), dtype=jnp.uint32)
        for j in js:
            b = jax.lax.dynamic_slice(c, (0, j), (R, P))
            acc = (acc << jnp.uint32(2)) | (jnp.uint32(3) - b)
        return acc

    # rc msb bases come from window offsets k-1, k-2, ... (complemented)
    rc_hi = (pack_rc(range(k - 1, k - 1 - n_hi, -1)) if n_hi
             else jnp.zeros((R, P), jnp.uint32))
    rc_lo = pack_rc(range(k - 1 - n_hi, -1, -1))

    fw_le = (fw_hi < rc_hi) | ((fw_hi == rc_hi) & (fw_lo <= rc_lo))
    hi = jnp.where(fw_le, fw_hi, rc_hi)
    lo = jnp.where(fw_le, fw_lo, rc_lo)

    # validity: window fits in read AND contains no invalid base
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    in_read = pos + k <= lengths[:, None]
    bad = (codes >= 4).astype(jnp.int32)
    cum = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), jnp.cumsum(bad, axis=1)], axis=1)
    window_bad = (jax.lax.dynamic_slice_in_dim(cum, k, P, axis=1)
                  - jax.lax.dynamic_slice_in_dim(cum, 0, P, axis=1)) > 0
    valid = in_read & ~window_bad
    return {"hi": hi, "lo": lo, "is_fw": fw_le, "valid": valid}
