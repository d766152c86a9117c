"""Benchmark: selective-alignment mapping + EM throughput on this chip.

Prints ONE JSON line:
  {"metric": "reads/s/chip", "value": N, "unit": "fragments/s",
   "vs_baseline": N, "human_frags_per_s": N|null,
   "em_iters_per_s": N, "mapped_fraction": N, ...}

The headline value is DP-validated selective-alignment throughput on
the HUMAN-SCALE index (200k-transcript synthetic, 100bp pairs; built
once into BENCH_CACHE) — the realistic chip number (VERDICT r3 #2).
sample_frags_per_s carries the bundled-sample (15 txps, 50bp) rate for
cross-round comparability, em_iters_per_s the sort-routed VBEM rate at
the 250k-txp/~1M-entry metric-of-record fixture (reference harness
analog: tests/benchmarks/quant_window.py).

vs_baseline divides by an assumed reference-salmon throughput of 5e5
fragments/s on a 32-core CPU node (the reference publishes no absolute
numbers — BASELINE.md). North-star: vs_baseline >= 5.

Env knobs: BENCH_PAIRS, BENCH_BATCH, BENCH_VALIDATE=0 (coverage-only),
BENCH_FAST=1 (sample-only), BENCH_CACHE (default
~/.cache/salmon_tpu_bench).
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "tests", "data")
BASELINE_FRAGS_PER_S = 5.0e5

TARGET_PAIRS = int(os.environ.get("BENCH_PAIRS", 131072))
BATCH = int(os.environ.get("BENCH_BATCH", 4096))
VALIDATE = os.environ.get("BENCH_VALIDATE", "1") != "0"
FAST = os.environ.get("BENCH_FAST", "0") == "1"
CACHE = os.environ.get(
    "BENCH_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                "salmon_tpu_bench"))


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _load_reads(r1_path, r2_path, R, pad_len=None):
    from salmon_tpu.io.fastq import _iter_fastq_seqs, pack_seqs
    import jax.numpy as jnp
    reads1 = list(_iter_fastq_seqs(r1_path))
    reads2 = list(_iter_fastq_seqs(r2_path))
    read_len = pad_len or max(len(s) for s in reads1 + reads2)
    c1, l1 = pack_seqs(reads1, len(reads1), read_len)
    c2, l2 = pack_seqs(reads2, len(reads2), read_len)
    n = len(reads1)
    reps = -(-R // n)
    return {
        "codes_l": jnp.asarray(np.tile(c1, (reps, 1))[:R]),
        "lengths_l": jnp.asarray(np.tile(l1, reps)[:R]),
        "codes_r": jnp.asarray(np.tile(c2, (reps, 1))[:R]),
        "lengths_r": jnp.asarray(np.tile(l2, reps)[:R]),
    }


def _map_throughput(idx, batch, n_batches):
    import jax
    import jax.numpy as jnp
    from salmon_tpu.constants import DEFAULTS
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays,
                                             map_paired_batch)
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat

    cfg = MapperConfig.from_index(idx, validate_mappings=VALIDATE)
    overrides = {}
    if os.environ.get("BENCH_SPARSE"):
        overrides["sparse_seed"] = os.environ["BENCH_SPARSE"] == "1"
    for env, field in (("BENCH_B", "seed_hits_per_end"),
                       ("BENCH_W", "weight_width"),
                       ("BENCH_T", "max_cands"),
                       ("BENCH_T2", "max_pair_cands"),
                       ("BENCH_DPB", "dp_budget"),
                       ("BENCH_STRIDE", "kmer_stride"),
                       ("BENCH_OCC", "occ_cap")):
        if os.environ.get(env):
            overrides[field] = int(os.environ[env])
    if overrides:
        import dataclasses
        cfg = dataclasses.replace(cfg, **overrides)
    dev = device_index_arrays(idx)
    fld = FragmentLengthDistribution(max_val=DEFAULTS.max_frag_length)
    fld_logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
    jax.block_until_ready(out["txp_mass"])
    mapped_frac = float(out["num_mapped"]) / float(out["num_processed"])
    R = batch["lengths_l"].shape[0]
    # steady-state throughput: a few individually-forced warm calls
    # (the first post-compile dispatches stall on backend autotune /
    # allocation), then the median of three pipelined loops, each
    # forced to completion by a scalar readback (async dispatch does
    # not block on this backend)
    for _ in range(3):
        out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
        _ = float(out["txp_mass"].sum())
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_batches):
            out = map_paired_batch(batch, dev, cfg, fld_logpmf, cp, co)
        _ = float(out["txp_mass"].sum())
        rates.append(n_batches * R / (time.perf_counter() - t0))
    rates.sort()
    return rates[1], mapped_frac


def _em_iters_per_s():
    """Sort-routed VBEM at the 250k-txp / ~1M-entry fixture."""
    from salmon_tpu.inference import em as em_mod
    from salmon_tpu.inference import fastem
    from salmon_tpu.inference.eqclasses import PackedEqClasses

    rng = np.random.default_rng(0)
    T = 250_000
    NCLS = 250_000
    sizes = np.minimum(1 + rng.geometric(0.35, NCLS), 50).astype(np.int32)
    seg = np.repeat(np.arange(NCLS), sizes)
    E = int(sizes.sum())
    labels = rng.integers(0, T, E).astype(np.int32)
    weights = rng.random(E)
    wsum = np.bincount(seg, weights=weights, minlength=NCLS)
    weights = weights / wsum[seg]
    counts = rng.integers(1, 50, NCLS).astype(np.float64)
    offsets = np.zeros(NCLS + 1, np.int64)
    offsets[1:] = np.cumsum(sizes)
    eq = PackedEqClasses(labels=labels, weights=weights, offsets=offsets,
                         counts=counts, class_sizes=sizes)
    eff = np.full(T, 300.0)
    a0 = em_mod.initial_alphas(T, None, eq.num_fragments)
    pri = em_mod.prior_alphas(T, eff, 1e-2, True)
    packed = fastem.pack_routed(eq, T, eff)

    def run(n):
        fastem.optimize_routed(eq, T, eff, a0, pri, True, 1e-12, n, n,
                               packed=packed)

    # steady-state marginal iteration rate: warmed runs at two trip
    # counts difference out the per-call overhead (transfers +
    # dispatch; block_until_ready does not block on this backend, but
    # optimize_routed reads back a scalar per chunk). Both trip counts
    # are warmed first — they compile separately, and a cold 400-trip
    # program once produced t400 < t100 and a nonsense marginal.
    run(100)
    run(400)
    for _ in range(2):
        t0 = time.perf_counter()
        run(100)
        t100 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(400)
        t400 = time.perf_counter() - t0
        if t400 > t100:
            break
    if t400 > t100:
        rate = 300.0 / (t400 - t100)
        _log(f"# EM: 100 iters {t100:.3f}s, 400 iters {t400:.3f}s -> "
             f"{rate:.0f} iters/s marginal "
             f"({100.0 / t100:.0f} incl. overhead)")
    else:
        rate = 400.0 / t400          # incl.-overhead fallback
        _log(f"# EM: marginal measurement unstable "
             f"(t100 {t100:.3f}s >= t400 {t400:.3f}s); reporting "
             f"incl.-overhead {rate:.0f} iters/s")
    return rate, E


def _build_human_cache(idx_dir, r1):
    """First-run hook: construct the human-scale cache (200k-transcript
    synthetic txome + truth-labeled reads + k=31 index) when absent.
    Runs in CPU-platform subprocesses so the TPU stays with this
    process; ~15-40 min on 4 cores, then reusable forever. Disable with
    BENCH_BUILD_HS=0."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    os.makedirs(CACHE, exist_ok=True)
    fa = os.path.join(CACHE, "txome_tmp.fasta")
    _log("# building human-scale cache (one-time, ~15-40 min)...")
    t0 = time.time()
    subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts",
                                      "make_synthetic_txome.py"),
         "--out-dir", CACHE, "--n-txps", "200000",
         "--n-pairs", "200000"], env=env, check=True)
    os.replace(os.path.join(CACHE, "txome.fasta"), fa)
    subprocess.run(
        [sys.executable, "-m", "salmon_tpu.cli", "index", "-t", fa,
         "-i", idx_dir, "-k", "31", "-p", "4"], env=env, check=True)
    os.remove(fa)
    _log(f"# human-scale cache built in {time.time() - t0:.0f}s")


def _human_scale():
    """Mapping throughput on the 200k-transcript synthetic index
    (built once into BENCH_CACHE on first run)."""
    from salmon_tpu.index.builder import load_index

    idx_dir = os.path.join(CACHE, "hs_idx")
    r1 = os.path.join(CACHE, "reads_1.fastq")
    r2 = os.path.join(CACHE, "reads_2.fastq")
    if not (os.path.isdir(idx_dir) and os.path.exists(r1)):
        if os.environ.get("BENCH_BUILD_HS", "1") == "0":
            _log("# human-scale cache absent and BENCH_BUILD_HS=0; "
                 f"skipping (expected at {CACHE})")
            return None, None
        try:
            _build_human_cache(idx_dir, r1)
        except Exception as e:
            _log(f"# human-scale cache build failed: {e}")
            return None, None
    t0 = time.perf_counter()
    idx = load_index(idx_dir)
    _log(f"# human index: {idx.num_targets} txps "
         f"(loaded in {time.perf_counter() - t0:.0f}s)")
    # bigger batches amortize per-dispatch overhead; the bucketized
    # table (~4.3 GB) leaves HBM room for R=16384 at human scale
    hbatch = max(BATCH, 16384)
    batch = _load_reads(r1, r2, hbatch)
    frags, mf = _map_throughput(idx, batch,
                                max(1, TARGET_PAIRS // hbatch))
    _log(f"# human-scale mapped fraction: {mf:.4f}")
    return frags, mf


def main():
    # watchdog: device discovery hangs indefinitely when the TPU tunnel
    # is down (observed 2026-08-18); emit a diagnostic JSON line and
    # exit instead of hanging the driver silently
    import threading
    ready = threading.Event()

    def _watchdog():
        if not ready.wait(float(os.environ.get("BENCH_DEVICE_TIMEOUT",
                                               900))):
            print(json.dumps({
                "metric": "reads/s/chip", "value": 0.0,
                "unit": "fragments/s", "vs_baseline": 0.0,
                "error": "device discovery timed out (TPU tunnel down)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    from salmon_tpu.index.builder import build_index

    dev_kind = jax.devices()[0].device_kind
    ready.set()
    _log(f"# bench device: {dev_kind}")

    idx = build_index(os.path.join(DATA, "transcripts.fasta"), k=25)
    batch = _load_reads(os.path.join(DATA, "reads_1.fastq"),
                        os.path.join(DATA, "reads_2.fastq"), BATCH)
    frags_per_s, mapped_frac = _map_throughput(
        idx, batch, max(1, TARGET_PAIRS // BATCH))
    _log(f"# sample mapped fraction: {mapped_frac:.4f}")

    human_fps = em_ips = em_entries = None
    if not FAST:
        try:
            human_fps, _human_mf = _human_scale()
        except Exception as e:  # never lose the headline number
            _log(f"# human-scale bench failed: {e}")
        try:
            em_ips, em_entries = _em_iters_per_s()
        except Exception as e:
            _log(f"# EM bench failed: {e}")

    # headline = the REALISTIC number: human-scale (200k-txp) mapping
    # throughput (VERDICT r3 next #2 — the toy 15-transcript sample
    # rate stays as sample_frags_per_s). Falls back to the sample rate
    # when the human cache is unavailable (BENCH_FAST / first run).
    headline = human_fps if human_fps else frags_per_s
    print(json.dumps({
        "metric": ("reads/s/chip (human-scale)" if human_fps
                   else "reads/s/chip (sample)"),
        "value": round(headline, 1),
        "unit": "fragments/s",
        "vs_baseline": round(headline / BASELINE_FRAGS_PER_S, 3),
        "mapped_fraction": round(mapped_frac, 4),
        "sample_frags_per_s": round(frags_per_s, 1),
        "human_frags_per_s": (round(human_fps, 1)
                              if human_fps else None),
        "em_iters_per_s": round(em_ips, 1) if em_ips else None,
        "em_fixture_entries": em_entries,
    }))


if __name__ == "__main__":
    main()
