"""Frozen-output drift gate.

The environment has no reference salmon binary and the reference repo
vendors no quant.sf fixtures (its test data lives on external mounts —
tests/test_quant.nf), so true binary-parity is not checkable here.
Instead tests/data/golden/ pins THIS engine's outputs on the bundled
sample at defaults (k=31, -l IU): any change to mapping, weighting, or
inference that shifts abundances fails this test and must consciously
regenerate the fixture (scripts note below).

Regenerate: index k=31 + quant -l IU on tests/data, then gzip quant.sf
into tests/data/golden/ (see git history of this file for the exact
drive).
"""

import gzip
import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN = os.path.join(DATA, "golden")


@pytest.fixture(scope="module")
def fresh_quant(tmp_path_factory):
    from salmon_tpu.cli import main
    d = tmp_path_factory.mktemp("golden")
    idx = str(d / "idx")
    out = str(d / "quant")
    assert main(["index", "-t", os.path.join(DATA, "transcripts.fasta"),
                 "-i", idx, "-k", "31"]) == 0
    assert main(["quant", "-i", idx, "-l", "IU",
                 "-1", os.path.join(DATA, "reads_1.fastq"),
                 "-2", os.path.join(DATA, "reads_2.fastq"),
                 "-o", out, "-q"]) == 0
    return out


def _parse_sf(lines):
    rows = {}
    for ln in lines[1:]:
        f = ln.rstrip("\n").split("\t")
        if len(f) >= 5:
            rows[f[0]] = (float(f[2]), float(f[3]), float(f[4]))
    return rows


def test_quant_sf_matches_golden(fresh_quant):
    with gzip.open(os.path.join(GOLDEN, "quant.sf.gz"), "rt") as fh:
        want = _parse_sf(fh.readlines())
    with open(os.path.join(fresh_quant, "quant.sf")) as fh:
        got = _parse_sf(fh.readlines())
    assert set(got) == set(want)
    w = np.array([want[k] for k in sorted(want)])
    g = np.array([got[k] for k in sorted(want)])
    # EffectiveLength / TPM / NumReads columns must match the pinned run
    np.testing.assert_allclose(g, w, rtol=5e-3, atol=0.5)


def test_lib_format_counts_match_golden(fresh_quant):
    want = json.load(open(os.path.join(GOLDEN,
                                       "lib_format_counts.json")))
    got = json.load(open(os.path.join(fresh_quant,
                                      "lib_format_counts.json")))
    for k in ("expected_format", "num_compatible_fragments",
              "num_assigned_fragments", "ISF", "ISR", "OSF", "OSR",
              "MSF", "MSR"):
        assert got[k] == want[k], k
