"""Toy-scale CI coverage for the config-5 shard-serial quant demo
(scripts/demo_config5_quant.py): table-less partitioned index ->
streamed sharded load -> per-shard hit collection -> merged
rank/DP/filter pipeline -> routed VBEM. Guards the genome-scale demo
path from bit-rot without the 41.5 GB index."""

import json
import os
import runpy
import sys

import numpy as np
import pytest


def test_demo_config5_toy(tmp_path, monkeypatch, capsys):
    from salmon_tpu.index import builder as bmod
    from salmon_tpu.index.builder import build_index, save_index

    data = os.path.join(os.path.dirname(__file__), "data")
    monkeypatch.setattr(bmod, "TABLE_DIRECT_MAX_KEYS", 1)
    idx = build_index(os.path.join(data, "transcripts.fasta"), k=25,
                      partition_bits=2)
    assert idx.table is None
    d = str(tmp_path / "tl_idx")
    save_index(idx, d)

    monkeypatch.setenv("CONFIG5_IDX", d)
    monkeypatch.setenv("CONFIG5_R1",
                       os.path.join(data, "reads_1.fastq"))
    monkeypatch.setenv("CONFIG5_R2",
                       os.path.join(data, "reads_2.fastq"))
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "demo_config5_quant.py")
    monkeypatch.setattr(sys, "argv", ["demo", "2", "20000"])
    ns = runpy.run_path(script, run_name="not_main")
    rc = ns["main"]()
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rep["n_shards"] == 2
    assert rep["n_frags"] == 10000
    assert rep["mapped_frac"] >= 0.999
