"""Eq-class dump/reload round-trip: quant -> --dumpEqWeights -> quant -e
must reproduce the same abundances (the reference's checkpoint boundary)."""

import os

import numpy as np
import pytest

from salmon_tpu.cli import main
from salmon_tpu.io.writers import read_quant_sf


def test_eqclass_roundtrip(tmp_path, sample_data_dir):
    idx = str(tmp_path / "idx")
    assert main(["index", "-t",
                 os.path.join(sample_data_dir, "transcripts.fasta"),
                 "-i", idx, "-k", "25"]) == 0
    out1 = str(tmp_path / "q1")
    assert main(["quant", "-i", idx, "-l", "IU",
                 "-1", os.path.join(sample_data_dir, "reads_1.fastq"),
                 "-2", os.path.join(sample_data_dir, "reads_2.fastq"),
                 "-o", out1, "--dumpEqWeights", "-q"]) == 0
    out2 = str(tmp_path / "q2")
    assert main(["quant", "-e", out1, "-o", out2, "-q"]) == 0

    q1 = read_quant_sf(os.path.join(out1, "quant.sf"))
    q2 = read_quant_sf(os.path.join(out2, "quant.sf"))
    assert q1["Name"] == q2["Name"]
    # same eq classes -> same EM fixed point (init differs: uniform); counts
    # agree closely
    np.testing.assert_allclose(q1["NumReads"], q2["NumReads"],
                               rtol=0.02, atol=1.0)


def test_read_eq_classes_formats(tmp_path):
    from salmon_tpu.alignment.eqmode import read_eq_classes
    p = tmp_path / "eq_classes.txt"
    p.write_text("2\n2\nT1\nT2\n1\t0\t5\n2\t0\t1\t0.75\t0.25\t10\n")
    names, eff, eq = read_eq_classes(str(p))
    assert names == ["T1", "T2"]
    assert eff is None
    assert eq.num_classes == 2
    np.testing.assert_array_equal(eq.counts, [5.0, 10.0])
    np.testing.assert_allclose(eq.weights[1:], [0.75, 0.25])
