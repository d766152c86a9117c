"""Committed perf regression guard (VERDICT r3 next #8).

Asserts on-device steady-state rates against the committed floors in
tests/perf_baseline.json (floor * (1 - slack)), the way the accuracy
gate already guards numerics. Reference analog: the <=5% wall-clock
regression gate (tests/benchmarks/README.md).

These tests are SKIPPED on CPU (the CI suite forces JAX_PLATFORMS=cpu;
CPU rates are not the metric of record). Run explicitly on TPU:

    JAX_PLATFORMS='' SALMON_TPU_PERF=1 python -m pytest \
        tests/test_perf_guard.py -q -s

First compile is ~8-10 min on the axon backend (persistent cache does
not rehydrate) — the guard measures steady-state AFTER warm-up, so
compile time never counts against the floor.
"""

import json
import os
import sys

import numpy as np
import pytest

BASELINE = os.path.join(os.path.dirname(__file__), "perf_baseline.json")


def _device_ok():
    if os.environ.get("SALMON_TPU_PERF") != "1":
        return False, "set SALMON_TPU_PERF=1 to run the perf guard"
    import jax
    kind = jax.devices()[0].device_kind
    with open(BASELINE) as fh:
        base = json.load(fh)
    if kind != base["device_kind_measured"]:
        return False, (f"device {kind!r} != baseline device "
                       f"{base['device_kind_measured']!r}")
    return True, ""


@pytest.fixture(scope="module")
def baseline():
    ok, why = _device_ok()
    if not ok:
        pytest.skip(why)
    with open(BASELINE) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def bench_mod():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    return bench


def test_sample_mapping_rate(baseline, bench_mod):
    from salmon_tpu.index.builder import build_index
    d = bench_mod.DATA
    idx = build_index(os.path.join(d, "transcripts.fasta"), k=25)
    batch = bench_mod._load_reads(os.path.join(d, "reads_1.fastq"),
                                  os.path.join(d, "reads_2.fastq"),
                                  bench_mod.BATCH)
    frags, mf = bench_mod._map_throughput(
        idx, batch, max(1, bench_mod.TARGET_PAIRS // bench_mod.BATCH))
    floor = baseline["sample_frags_per_s"] * (1 - baseline["slack"])
    assert mf >= 0.999, mf
    assert frags >= floor, (
        f"sample mapping {frags:.0f} frags/s < floor {floor:.0f} "
        f"(baseline {baseline['sample_frags_per_s']:.0f}, "
        f"slack {baseline['slack']})")


def test_em_iteration_rate(baseline, bench_mod):
    iters, _entries = bench_mod._em_iters_per_s()
    floor = baseline["em_iters_per_s"] * (1 - baseline["slack"])
    assert iters >= floor, (
        f"EM {iters:.0f} iters/s < floor {floor:.0f}")


def test_human_scale_mapping_rate(baseline, bench_mod):
    """Guards the realistic 200k-transcript rate — the headline metric.
    Needs the prebuilt bench cache (skips when absent rather than
    spending ~40 min building it inside a test run)."""
    idx_dir = os.path.join(bench_mod.CACHE, "hs_idx")
    r1 = os.path.join(bench_mod.CACHE, "reads_1.fastq")
    r2 = os.path.join(bench_mod.CACHE, "reads_2.fastq")
    if not (os.path.isdir(idx_dir) and os.path.exists(r1)):
        pytest.skip(f"bench cache absent at {bench_mod.CACHE}")
    from salmon_tpu.index.builder import load_index
    idx = load_index(idx_dir)
    hbatch = max(bench_mod.BATCH, 16384)
    batch = bench_mod._load_reads(r1, r2, hbatch)
    frags, mf = bench_mod._map_throughput(
        idx, batch, max(1, bench_mod.TARGET_PAIRS // hbatch))
    floor = baseline["human_frags_per_s"] * (1 - baseline["slack"])
    assert mf >= 0.99, mf
    assert frags >= floor, (
        f"human-scale mapping {frags:.0f} frags/s < floor {floor:.0f}")
