"""2-process multi-host quant (virtual CPU devices) matches single-process.

Exercises jax.distributed init, the global-mesh shard_map path,
make_array_from_process_local_data batching, and the cross-host eq-table
allgather merge (salmon_tpu/parallel/distributed.py).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")


@pytest.mark.slow
def test_two_process_quant_matches_single(tmp_path):
    from salmon_tpu.io.writers import read_quant_sf

    idx = str(tmp_path / "idx")
    env0 = dict(os.environ)
    env0["JAX_PLATFORMS"] = "cpu"
    env0["PYTHONPATH"] = REPO
    env0.pop("SALMON_TPU_COORDINATOR", None)
    subprocess.run(
        [sys.executable, "-m", "salmon_tpu", "index", "-t",
         os.path.join(DATA, "transcripts.fasta"), "-i", idx, "-k", "25"],
        env=env0, check=True, capture_output=True)

    def quant(out, multihost, r1, r2, port="8891"):
        procs = []
        for pid in range(2 if multihost else 1):
            env = dict(env0)
            if multihost:
                env["SALMON_TPU_COORDINATOR"] = "127.0.0.1:" + port
                env["SALMON_TPU_NUM_PROCS"] = "2"
                env["SALMON_TPU_PROC_ID"] = str(pid)
                env["XLA_FLAGS"] = \
                    "--xla_force_host_platform_device_count=2"
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "salmon_tpu", "quant", "-i", idx,
                 "-l", "IU", "-1", *r1, "-2", *r2,
                 "-o", out, "-q"], env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
        for p in procs:
            assert p.wait(timeout=600) == 0

    r1 = [os.path.join(DATA, "reads_1.fastq")]
    r2 = [os.path.join(DATA, "reads_2.fastq")]
    q1 = str(tmp_path / "q1")
    q2 = str(tmp_path / "q2")
    quant(q1, False, r1, r2)
    quant(q2, True, r1, r2)
    a = read_quant_sf(os.path.join(q1, "quant.sf"))
    b = read_quant_sf(os.path.join(q2, "quant.sf"))
    assert a["Name"] == b["Name"]
    # all 10k fragments must be processed exactly once across hosts
    import json
    meta = json.load(open(os.path.join(q2, "aux_info",
                                       "meta_info.json")))
    assert meta["num_processed"] == 10000
    d = np.abs(a["NumReads"] - b["NumReads"]).max()
    assert d <= 1.0, f"multihost counts diverge by {d}"

    # --- split-file IO affinity: 3 unequal files over 2 processes,
    # each process streams only its own files (round-robin) and ragged
    # tails pad via the has-data collective
    def split_fastq(src, parts, sizes):
        outs = []
        with open(src) as fh:
            recs = fh.read().splitlines(keepends=False)
        at = 0
        for j, n in enumerate(sizes):
            p = str(tmp_path / f"{parts}_{j}.fastq")
            with open(p, "w") as o:
                o.write("\n".join(recs[4 * at:4 * (at + n)]) + "\n")
            outs.append(p)
            at += n
        return outs

    sizes = [4000, 3500, 2500]
    r1s = split_fastq(r1[0], "r1", sizes)
    r2s = split_fastq(r2[0], "r2", sizes)
    q3 = str(tmp_path / "q3")
    quant(q3, True, r1s, r2s, port="8893")
    c = read_quant_sf(os.path.join(q3, "quant.sf"))
    meta3 = json.load(open(os.path.join(q3, "aux_info",
                                        "meta_info.json")))
    assert meta3["num_processed"] == 10000
    d3 = np.abs(a["NumReads"] - np.asarray(c["NumReads"])).max()
    assert d3 <= 1.5, f"split-file multihost counts diverge by {d3}"


@pytest.mark.slow
def test_multihost_with_sharded_index(tmp_path):
    """--indexShards composed with a 2-process launch: a (reads=2,
    kmer=2) global mesh — each process holds one mesh row, the k-mer
    planes shard over its two local devices (BASELINE config-5 shape:
    pod-scale genome-decoy index)."""
    import json
    import subprocess as sp

    from salmon_tpu.io.writers import read_quant_sf

    idx = str(tmp_path / "idx")
    env0 = dict(os.environ)
    env0["JAX_PLATFORMS"] = "cpu"
    env0["PYTHONPATH"] = REPO
    env0.pop("SALMON_TPU_COORDINATOR", None)
    sp.run([sys.executable, "-m", "salmon_tpu", "index", "-t",
            os.path.join(DATA, "transcripts.fasta"), "-i", idx,
            "-k", "25"], env=env0, check=True, capture_output=True)

    def quant(out, multihost, shards):
        procs = []
        for pid in range(2 if multihost else 1):
            env = dict(env0)
            if multihost:
                env["SALMON_TPU_COORDINATOR"] = "127.0.0.1:8895"
                env["SALMON_TPU_NUM_PROCS"] = "2"
                env["SALMON_TPU_PROC_ID"] = str(pid)
                env["XLA_FLAGS"] = \
                    "--xla_force_host_platform_device_count=2"
            cmd = [sys.executable, "-m", "salmon_tpu", "quant", "-i",
                   idx, "-l", "IU",
                   "-1", os.path.join(DATA, "reads_1.fastq"),
                   "-2", os.path.join(DATA, "reads_2.fastq"),
                   "-o", out, "-q"]
            if shards:
                cmd += ["--indexShards", str(shards)]
            else:
                # sharded parity is defined vs the sparse seed flow
                # (the default dense flow weights multimappers ~1%
                # differently)
                env["SALMON_TPU_SPARSE_SEED"] = "1"
            procs.append(sp.Popen(cmd, env=env, stdout=sp.DEVNULL,
                                  stderr=sp.DEVNULL))
        for p in procs:
            assert p.wait(timeout=600) == 0

    q1 = str(tmp_path / "q1")
    q2 = str(tmp_path / "q2")
    quant(q1, False, 0)
    quant(q2, True, 2)
    a = read_quant_sf(os.path.join(q1, "quant.sf"))
    b = read_quant_sf(os.path.join(q2, "quant.sf"))
    meta = json.load(open(os.path.join(q2, "aux_info",
                                       "meta_info.json")))
    assert meta["num_processed"] == 10000
    d = np.abs(np.asarray(a["NumReads"]) - np.asarray(b["NumReads"])).max()
    assert d <= 1.0, f"sharded multihost counts diverge by {d}"


@pytest.mark.slow
def test_multihost_bias_correction_matches_single(tmp_path):
    """--seqBias --gcBias under a 2-process launch must match the
    single-process run: the observed-bias histograms are collected per
    process over its own rows and allreduced once after the stream
    (mergeObservedBias analog, WorkerRuntimeContext.hpp:22-70)."""
    import json
    import subprocess as sp

    from salmon_tpu.io.writers import read_quant_sf

    idx = str(tmp_path / "idx")
    env0 = dict(os.environ)
    env0["JAX_PLATFORMS"] = "cpu"
    env0["PYTHONPATH"] = REPO
    env0.pop("SALMON_TPU_COORDINATOR", None)
    sp.run([sys.executable, "-m", "salmon_tpu", "index", "-t",
            os.path.join(DATA, "transcripts.fasta"), "-i", idx,
            "-k", "25"], env=env0, check=True, capture_output=True)

    def quant(out, multihost):
        procs = []
        for pid in range(2 if multihost else 1):
            env = dict(env0)
            if multihost:
                env["SALMON_TPU_COORDINATOR"] = "127.0.0.1:8897"
                env["SALMON_TPU_NUM_PROCS"] = "2"
                env["SALMON_TPU_PROC_ID"] = str(pid)
                env["XLA_FLAGS"] = \
                    "--xla_force_host_platform_device_count=2"
            procs.append(sp.Popen(
                [sys.executable, "-m", "salmon_tpu", "quant", "-i", idx,
                 "-l", "IU",
                 "-1", os.path.join(DATA, "reads_1.fastq"),
                 "-2", os.path.join(DATA, "reads_2.fastq"),
                 "-o", out, "-q", "--seqBias", "--gcBias"],
                env=env, stdout=sp.DEVNULL, stderr=sp.DEVNULL))
        for p in procs:
            assert p.wait(timeout=600) == 0

    q1 = str(tmp_path / "q1")
    q2 = str(tmp_path / "q2")
    quant(q1, False)
    quant(q2, True)
    a = read_quant_sf(os.path.join(q1, "quant.sf"))
    b = read_quant_sf(os.path.join(q2, "quant.sf"))
    assert a["Name"] == b["Name"]
    meta = json.load(open(os.path.join(q2, "aux_info",
                                       "meta_info.json")))
    assert meta["num_processed"] == 10000
    assert meta["seq_bias_correct"] is True
    d = np.abs(a["NumReads"] - np.asarray(b["NumReads"])).max()
    assert d <= 1.0, f"multihost bias-corrected counts diverge by {d}"
    # the bias-corrected effective lengths must agree too (they only do
    # when the merged histograms match the single-process observation)
    de = np.abs(np.asarray(a["EffectiveLength"], float)
                - np.asarray(b["EffectiveLength"], float)).max()
    assert de <= 0.5, f"bias-corrected effective lengths diverge by {de}"
