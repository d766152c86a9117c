"""Sharded-index mapping: the k-mer dictionary + occurrence CSR split
over a mesh axis, reads data-parallel over the other.

Memory model (see index.shard for the host-side partitioning): a
genome-decoy index (BASELINE config 5) is ~30+ GB of table+occurrences —
too big to replicate per chip. Here the mesh is 2-D:

    mesh = ("reads": Dr, "kmer": Dk)

  * batch rows are sharded over "reads" and replicated over "kmer";
  * the stacked per-shard tables/occurrence planes are sharded over
    "kmer" (leading axis) and replicated over "reads";
  * each device probes its own shard for its read block (queries whose
    owner is another shard are masked not-found), expands its local
    occurrences into the flat hit list of the sparse seed flow, and the
    per-shard hit lists are all-gathered over "kmer" — hits carry
    global (txp, pos) coordinates so concatenation is trivial;
  * after ranking, each device takes the kmer-axis-th sub-block of its
    read rows and runs the full pair/DP/filter pipeline on it, so the
    expensive post-seed stages use ALL Dr*Dk devices (no redundant
    work); fixed-size statistics psum over both axes and eq tensors
    come back sharded over (reads, kmer).

The seeding semantics match the single-device sparse flow exactly:
each shard collects up to the per-end budget (a superset of the global
kept set, since each window's occurrences live in one owner shard) and
the budget is re-applied over the gathered union
(seed_sparse.rebudget_hits) — so results are bit-identical to the
single-device path at ANY budget and do not depend on --indexShards
(tested).

Reference analog: none — the reference's pufferfish index is a single
host-RAM mmap shared by threads (SURVEY.md §2.11). Sharding is what the
same capability looks like on an HBM budget.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from salmon_tpu.index.builder import TranscriptomeIndex
from salmon_tpu.index.shard import ShardedIndexArrays, shard_index_arrays
from salmon_tpu.mapping.kmers import extract_kmers
from salmon_tpu.mapping.lookup import hash_lookup, mix32b
from salmon_tpu.mapping.pipeline import (MapperConfig, _SEQ4_SHIFT,
                                         _seq4_words,
                                         map_paired_from_cands,
                                         map_single_from_cands)
from salmon_tpu.mapping.score import candidate_read_start
from salmon_tpu.mapping.seed_sparse import (collect_hits_sparse,
                                            rank_hits, rebudget_hits)
from salmon_tpu.parallel.quant_step import _PSUM_KEYS

READS_AXIS = "reads"
KMER_AXIS = "kmer"


def make_sharded_mesh(n_kmer_shards: int,
                      n_devices: int | None = None) -> Mesh:
    """A ("reads", "kmer") mesh: the last `n_kmer_shards` devices of
    each row hold one index shard each. In a multi-host launch the mesh
    spans all processes (jax.devices() is global, process-major), so
    each kmer row stays within one host when the local device count is
    a multiple of n_kmer_shards."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % n_kmer_shards:
        raise ValueError(
            f"{n} devices not divisible by {n_kmer_shards} index shards")
    arr = np.array(devs).reshape(n // n_kmer_shards, n_kmer_shards)
    return Mesh(arr, (READS_AXIS, KMER_AXIS))


def _put(arr, sharding):
    """device_put that also works on a multi-process (global) mesh —
    every process holds the full host array and contributes its
    addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_batch_reads(mesh: Mesh, batch: dict) -> dict:
    """Place host batch arrays sharded over the reads axis (replicated
    over the kmer axis)."""
    sh = NamedSharding(mesh, P(READS_AXIS))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def device_sharded_index(idx: TranscriptomeIndex, mesh: Mesh,
                         sharded: ShardedIndexArrays | None = None):
    """Materialize the index on the mesh: per-shard planes sharded over
    the kmer axis, everything else replicated. Returns (dev dict, cfg
    overrides dict)."""
    dk = mesh.shape[KMER_AXIS]
    if sharded is None:
        sharded = shard_index_arrays(idx, dk)
    if sharded.n_shards != dk:
        raise ValueError(
            f"index sharded {sharded.n_shards} ways, mesh kmer axis {dk}")
    shard_sh = NamedSharding(mesh, P(KMER_AXIS))
    repl = NamedSharding(mesh, P())
    total = int(idx.seq_offsets[-1])
    off_dtype = np.int64 if total + _SEQ4_SHIFT + 256 >= 2**31 \
        else np.int32
    big = total >= 2**28
    dev = {
        "tab_rows": _put(sharded.tab_rows, shard_sh),
        "occ_oct": _put(sharded.occ_oct, shard_sh),
        "txp_lens": _put(idx.lengths.astype(np.int32), repl),
        "seq_codes": _put(
            idx.seq_codes if not big else np.zeros(1, np.uint8), repl),
        "seq_off": _put(idx.seq_offsets.astype(off_dtype), repl),
        "seq4": _put(_seq4_words(idx), repl),
    }
    overrides = {"n_slots": sharded.n_slots,
                 "shard_bits": sharded.shard_bits}
    return dev, overrides


def sharded_config(idx: TranscriptomeIndex, mesh: Mesh,
                   overrides: dict, opts=None, **extra) -> MapperConfig:
    base = (MapperConfig.from_index(idx, opts, **extra) if opts is not None
            else MapperConfig.from_index(idx, **extra))
    return dataclasses.replace(
        base, n_slots=overrides["n_slots"], sparse_seed=True)


def _local_seeds(codes, lengths, tab_rows, cfg: MapperConfig,
                 shard_bits: int):
    """Per-end k-mer extraction + local-shard lookup with owner mask."""
    km = extract_kmers(codes, lengths, cfg.k)
    if cfg.kmer_stride > 1:
        km = {k: v[:, ::cfg.kmer_stride] for k, v in km.items()}
    start, count, found, inl, itxp, ipf = hash_lookup(
        km["hi"], km["lo"], tab_rows, cfg.n_slots, cfg.max_probes)
    if shard_bits:
        owner = (mix32b(km["hi"], km["lo"])
                 >> jnp.uint32(32 - shard_bits)).astype(jnp.int32)
        mine = owner == jax.lax.axis_index(KMER_AXIS).astype(jnp.int32)
        found = found & mine
    return km, (start, count, found, inl, itxp, ipf)


def _sub_block(a, s, n_blocks):
    """The s-th of n_blocks equal row blocks of `a` (axis 0)."""
    sub = a.shape[0] // n_blocks
    return jax.lax.dynamic_slice_in_dim(a, s * sub, sub, axis=0)


def _sharded_cands(ends_cl, dev, cfg: MapperConfig, shard_bits: int,
                   dk: int):
    """Seed candidates against the local shard, all-gather hits over the
    kmer axis, rank, then slice this device's read sub-block.

    ends_cl: list of (codes, lengths) per end, full local read shard.
    Returns (cands_starts, sub_slicer) where sub_slicer slices any
    (R_local, ...) array to this device's sub-block.
    """
    tab_rows = dev["tab_rows"][0]
    occ_oct = dev["occ_oct"][0]
    seeded = [_local_seeds(c, l, tab_rows, cfg, shard_bits)
              for c, l in ends_cl]
    E = len(seeded)
    R, Pw = seeded[0][1][0].shape
    from salmon_tpu.mapping.score import diag_bucket_bits_for
    wb = max(8, int(np.ceil(np.log2(max(Pw, 2)))))
    hits = collect_hits_sparse(
        seeded, occ_oct, occ_cap=cfg.occ_cap,
        max_occs_per_hit=cfg.max_occs_per_hit,
        hits_per_end=cfg.seed_hits_per_end, stride=cfg.kmer_stride,
        diag_bucket_bits=diag_bucket_bits_for(cfg.max_tpos, wb))
    # concat the shards' hit lists (global coordinates), then re-apply
    # the per-end budget over the union so results match the
    # single-device path bit-exactly (seed_sparse.rebudget_hits)
    hits = tuple(
        jax.lax.all_gather(h, KMER_AXIS, tiled=True) for h in hits)
    hits = rebudget_hits(hits, P=Pw, hits_per_end=cfg.seed_hits_per_end)
    cands = rank_hits(hits, R=R, E=E, P=Pw, max_cands=cfg.max_cands)

    s = jax.lax.axis_index(KMER_AXIS)
    sub = lambda a: _sub_block(a, s, dk)
    cands_starts = []
    for cand, (_, lengths) in zip(cands, ends_cl):
        cand_sub = {k: sub(v) for k, v in cand.items()}
        start = candidate_read_start(cand_sub, sub(lengths), cfg.k)
        cands_starts.append((cand_sub, start))
    return cands_starts, sub


def _merge_both(out: dict) -> dict:
    return {k: (jax.lax.psum(v, (READS_AXIS, KMER_AXIS))
                if k in _PSUM_KEYS else v)
            for k, v in out.items()}


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _paired_sharded(mesh, batch, dev, cfg, shard_bits, fld_logpmf, cp,
                    co):
    dk = mesh.shape[KMER_AXIS]

    def fn(b, d):
        cands, sub = _sharded_cands(
            [(b["codes_l"], b["lengths_l"]),
             (b["codes_r"], b["lengths_r"])], d, cfg, shard_bits, dk)
        bsub = {k: sub(v) for k, v in b.items()}
        dloc = dict(d)
        for k in ("tab_rows", "occ_oct"):
            dloc[k] = dloc[k][0]
        out = map_paired_from_cands(cands, bsub, dloc, cfg, fld_logpmf,
                                    cp, co)
        return _merge_both(out)

    spec_b = {k: P(READS_AXIS) for k in batch}
    spec_d = {k: (P(KMER_AXIS) if k in ("tab_rows", "occ_oct")
                  else P()) for k in dev}
    out_shapes = jax.eval_shape(
        lambda b: map_paired_from_cands(
            *_dummy_cands(b, cfg), b, _unstack_dev(dev), cfg,
            fld_logpmf, cp, co), batch)
    spec_out = {k: (P() if k in _PSUM_KEYS else P((READS_AXIS, KMER_AXIS)))
                for k in out_shapes}
    return shard_map(fn, mesh=mesh, in_specs=(spec_b, spec_d),
                     out_specs=spec_out)(batch, dev)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _single_sharded(mesh, batch, dev, cfg, shard_bits, fld_logpmf, cs):
    dk = mesh.shape[KMER_AXIS]

    def fn(b, d):
        cands, sub = _sharded_cands(
            [(b["codes"], b["lengths"])], d, cfg, shard_bits, dk)
        bsub = {k: sub(v) for k, v in b.items()}
        dloc = dict(d)
        for k in ("tab_rows", "occ_oct"):
            dloc[k] = dloc[k][0]
        out = map_single_from_cands(cands, bsub, dloc, cfg, fld_logpmf,
                                    cs)
        return _merge_both(out)

    spec_b = {k: P(READS_AXIS) for k in batch}
    spec_d = {k: (P(KMER_AXIS) if k in ("tab_rows", "occ_oct")
                  else P()) for k in dev}
    out_shapes = jax.eval_shape(
        lambda b: map_single_from_cands(
            *_dummy_cands(b, cfg, single=True), b, _unstack_dev(dev),
            cfg, fld_logpmf, cs), batch)
    spec_out = {k: (P() if k in _PSUM_KEYS else P((READS_AXIS, KMER_AXIS)))
                for k in out_shapes}
    return shard_map(fn, mesh=mesh, in_specs=(spec_b, spec_d),
                     out_specs=spec_out)(batch, dev)


def _unstack_dev(dev):
    d = dict(dev)
    for k in ("tab_rows", "occ_oct"):
        d[k] = d[k][0]
    return d


def _dummy_cands(batch, cfg: MapperConfig, single: bool = False):
    """Shape-only candidate structures for eval_shape of the out specs."""
    key = "lengths" if single else "lengths_l"
    R = batch[key].shape[0]
    T = cfg.max_cands
    cand = {
        "txp": jnp.zeros((R, T), jnp.int32),
        "is_fw": jnp.zeros((R, T), bool),
        "score": jnp.zeros((R, T), jnp.int32),
        "min_diag": jnp.zeros((R, T), jnp.int32),
        "valid": jnp.zeros((R, T), bool),
    }
    start = jnp.zeros((R, T), jnp.int32)
    n_ends = 1 if single else 2
    return ([(cand, start)] * n_ends,)


def sharded_map_paired(mesh: Mesh, batch: dict, dev: dict,
                       cfg: MapperConfig, shard_bits: int, fld_logpmf,
                       compat_paired, compat_orphan) -> dict:
    """Map one paired batch with the index sharded over the kmer axis.
    Batch rows must be divisible by the total device count."""
    R = batch["lengths_l"].shape[0]
    nd = mesh.shape[READS_AXIS] * mesh.shape[KMER_AXIS]
    if R % nd:
        raise ValueError(f"batch rows {R} not divisible by {nd} devices")
    return _paired_sharded(mesh, batch, dev, cfg, shard_bits,
                           fld_logpmf, compat_paired, compat_orphan)


def sharded_map_single(mesh: Mesh, batch: dict, dev: dict,
                       cfg: MapperConfig, shard_bits: int, fld_logpmf,
                       compat_single) -> dict:
    R = batch["lengths"].shape[0]
    nd = mesh.shape[READS_AXIS] * mesh.shape[KMER_AXIS]
    if R % nd:
        raise ValueError(f"batch rows {R} not divisible by {nd} devices")
    return _single_sharded(mesh, batch, dev, cfg, shard_bits,
                           fld_logpmf, compat_single)
