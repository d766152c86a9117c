"""End-to-end CLI tests on the bundled sample data (reference analog:
cmake/TestSalmonQuasi.cmake — index, quant, assert quant.sf exists)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from salmon_tpu.cli import main
from salmon_tpu.io.writers import read_quant_sf


@pytest.fixture(scope="module")
def built_index(sample_data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    rc = main(["index", "-t",
               os.path.join(sample_data_dir, "transcripts.fasta"),
               "-i", out, "-k", "25"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "info.json"))
    return out


def test_quant_paired_end_to_end(built_index, sample_data_dir, tmp_path):
    out = str(tmp_path / "quant_out")
    rc = main(["quant", "-i", built_index, "-l", "A",
               "-1", os.path.join(sample_data_dir, "reads_1.fastq"),
               "-2", os.path.join(sample_data_dir, "reads_2.fastq"),
               "-o", out, "--dumpEq", "-q"])
    assert rc == 0
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    assert len(q["Name"]) == 15
    assert q["NumReads"].sum() > 0
    with open(os.path.join(out, "aux_info", "meta_info.json")) as fh:
        meta = json.load(fh)
    assert meta["num_processed"] == 10000
    assert meta["percent_mapped"] > 90.0
    assert os.path.exists(os.path.join(out, "lib_format_counts.json"))
    assert os.path.exists(os.path.join(out, "cmd_info.json"))
    assert os.path.exists(os.path.join(out, "aux_info",
                                       "eq_classes.txt.gz"))
    assert os.path.exists(os.path.join(out, "aux_info", "ambig_info.tsv"))
    assert os.path.exists(os.path.join(out, "libParams", "flenDist.txt"))


def test_quantmerge(built_index, sample_data_dir, tmp_path):
    outs = []
    for i in range(2):
        out = str(tmp_path / f"s{i}")
        rc = main(["quant", "-i", built_index, "-l", "IU",
                   "-1", os.path.join(sample_data_dir, "reads_1.fastq"),
                   "-2", os.path.join(sample_data_dir, "reads_2.fastq"),
                   "-o", out, "-q"])
        assert rc == 0
        outs.append(out)
    merged = str(tmp_path / "merged.tsv")
    rc = main(["quantmerge", "--quants", *outs, "--names", "a", "b",
               "--column", "numreads", "-o", merged])
    assert rc == 0
    lines = open(merged).read().strip().split("\n")
    assert lines[0] == "Name\ta\tb"
    assert len(lines) == 16
    # identical inputs -> identical columns
    for ln in lines[1:]:
        f = ln.split("\t")
        assert f[1] == f[2]


def test_gene_map_rollup(built_index, sample_data_dir, tmp_path):
    # synthetic t2g: map all transcripts to two genes
    from salmon_tpu.index.builder import load_index
    idx = load_index(built_index)
    t2g_path = str(tmp_path / "t2g.tsv")
    with open(t2g_path, "w") as fh:
        for i, nm in enumerate(idx.names):
            fh.write(f"{nm}\tGENE{i % 2}\n")
    out = str(tmp_path / "gq")
    rc = main(["quant", "-i", built_index, "-l", "IU",
               "-1", os.path.join(sample_data_dir, "reads_1.fastq"),
               "-2", os.path.join(sample_data_dir, "reads_2.fastq"),
               "-o", out, "-g", t2g_path, "-q"])
    assert rc == 0
    gq = read_quant_sf(os.path.join(out, "quant.genes.sf"))
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    assert sorted(gq["Name"]) == ["GENE0", "GENE1"]
    np.testing.assert_allclose(gq["NumReads"].sum(), q["NumReads"].sum(),
                               rtol=1e-6)
    np.testing.assert_allclose(gq["TPM"].sum(), q["TPM"].sum(), rtol=1e-6)


def test_alevin_stub():
    assert main(["alevin"]) == 1


def test_insufficient_frags(built_index, tmp_path):
    # empty read files -> graceful empty outputs + exit 1
    r1 = tmp_path / "e1.fastq"
    r2 = tmp_path / "e2.fastq"
    r1.write_text("")
    r2.write_text("")
    out = str(tmp_path / "empty_out")
    rc = main(["quant", "-i", built_index, "-l", "IU",
               "-1", str(r1), "-2", str(r2), "-o", out, "-q"])
    assert rc == 1
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    assert q["NumReads"].sum() == 0
    with open(os.path.join(out, "aux_info", "meta_info.json")) as fh:
        meta = json.load(fh)
    assert meta["quant_errors"] == ["insufficient_assigned_fragments"]


def test_version_check_skip_env(monkeypatch, capsys):
    """SALMON_NO_VERSION_CHECK and --no-version-check suppress the
    check; without them the offline env degrades to the reference's
    'Version Info Exception' line (VersionChecker.cpp:5-31), never an
    error."""
    import salmon_tpu.cli as cli
    calls = []
    monkeypatch.setattr(cli, "_version_message",
                        lambda *a, **k: calls.append(1) or "VMSG\n")
    monkeypatch.setenv("SALMON_NO_VERSION_CHECK", "true")
    assert cli.main(["quantmerge", "--quants", "/nonexistent",
                     "-o", "/tmp/x"]) != 0 or True
    assert not calls
    monkeypatch.setenv("SALMON_NO_VERSION_CHECK", "")
    try:
        cli.main(["quantmerge", "--quants", "/nonexistent",
                  "-o", "/tmp/x"])
    except Exception:
        pass
    assert calls


def test_version_message_offline(monkeypatch):
    import salmon_tpu.cli as cli
    msg = cli._version_message(timeout_s=0.2)
    assert msg.startswith("Version ")
