"""Single-end quantification and stranded library formats end-to-end."""

import os

import numpy as np
import pytest

from salmon_tpu.cli import main
from salmon_tpu.io.writers import read_quant_sf
from salmon_tpu.utils.dna import decode_seq, revcomp_codes


@pytest.fixture(scope="module")
def idx_dir(sample_data_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    assert main(["index", "-t",
                 os.path.join(sample_data_dir, "transcripts.fasta"),
                 "-i", d, "-k", "25"]) == 0
    return d


def test_single_end_quant(idx_dir, sample_data_dir, tmp_path):
    """-r single-end path: map read1 only; counts track truth."""
    import collections
    from scipy.stats import spearmanr

    out = str(tmp_path / "se")
    rc = main(["quant", "-i", idx_dir, "-l", "A",
               "-r", os.path.join(sample_data_dir, "reads_1.fastq"),
               "-o", out, "-q"])
    assert rc == 0
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    truth = collections.Counter()
    with open(os.path.join(sample_data_dir, "reads_1.fastq")) as fh:
        for i, line in enumerate(fh):
            if i % 4 == 0:
                truth[line[1:].split(":")[1]] += 1
    est = dict(zip(q["Name"], q["NumReads"]))
    t = np.array([truth[k] for k in truth], dtype=float)
    e = np.array([est.get(k, 0.0) for k in truth])
    rho = spearmanr(t, e).statistic
    # 0.97 (not .99): the single-end ambiguous fragment-length model
    # (LogCMFCache analog) trades a little rank correlation between
    # near-identical HOX paralogs on this 15-txp sample, exactly as the
    # reference's modelSingleFragProb path does
    assert rho >= 0.97, f"single-end Spearman {rho}"
    assert e.sum() >= 9500  # nearly all reads map
    import json
    meta = json.load(open(os.path.join(out, "aux_info",
                                       "meta_info.json")))
    assert meta["library_types"] in (["SF"], ["U"], ["SR"])


@pytest.fixture(scope="module")
def stranded_reads(sample_data_dir, tmp_path_factory):
    """Synthesized ISR library: read1 = rc mate at the fragment END,
    read2 = forward mate at the fragment START."""
    from salmon_tpu.index.builder import build_index

    rng = np.random.default_rng(11)
    idx = build_index(os.path.join(sample_data_dir, "transcripts.fasta"),
                      k=25)
    d = tmp_path_factory.mktemp("isr")
    r1 = d / "r1.fastq"
    r2 = d / "r2.fastq"
    RL = 76
    with open(r1, "w") as o1, open(r2, "w") as o2:
        for i in range(3000):
            tid = int(rng.integers(0, idx.num_valid_targets))
            codes = idx.transcript_codes(tid)
            L = codes.shape[0]
            fl = min(250, L)
            s = int(rng.integers(0, L - fl + 1))
            fw_mate = decode_seq(codes[s:s + RL])
            rc_mate = decode_seq(revcomp_codes(codes[s + fl - RL:s + fl]))
            o1.write(f"@p{i}\n{rc_mate}\n+\n{'I' * RL}\n")
            o2.write(f"@p{i}\n{fw_mate}\n+\n{'I' * RL}\n")
    return str(r1), str(r2)


def test_isr_autodetect_and_compat(idx_dir, stranded_reads, tmp_path):
    r1, r2 = stranded_reads
    out = str(tmp_path / "isr")
    rc = main(["quant", "-i", idx_dir, "-l", "A", "-1", r1, "-2", r2,
               "-o", out, "-q"])
    assert rc == 0
    import json
    lf = json.load(open(os.path.join(out, "lib_format_counts.json")))
    # detected as the stranded inward library it is
    assert lf["expected_format"] == "ISR"
    assert lf["ISR"] > 10 * max(lf["ISF"], 1)
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    assert q["NumReads"].sum() > 2800


def test_explicit_wrong_library_drops_compat(idx_dir, stranded_reads,
                                             tmp_path):
    """Forcing -l ISF on an ISR library: observed counts still show the
    true orientation (counted pre-filter, like the reference's hit-type
    counters), while incompatPrior=0 drops the fragments from eq
    classes."""
    r1, r2 = stranded_reads
    out = str(tmp_path / "wrong")
    rc = main(["quant", "-i", idx_dir, "-l", "ISF", "-1", r1, "-2", r2,
               "-o", out, "-q"])
    # everything is incompatible -> insufficient assigned fragments ->
    # empty abundances + exit 1 (reference InsufficientAssignedFragments
    # path)
    assert rc == 1
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    assert q["NumReads"].sum() == 0

    # with a nonzero incompatPrior the fragments are kept (downweighted)
    out2 = str(tmp_path / "prior")
    rc = main(["quant", "-i", idx_dir, "-l", "ISF", "-1", r1, "-2", r2,
               "-o", out2, "--incompatPrior", "1e-3", "-q"])
    assert rc == 0
    q2 = read_quant_sf(os.path.join(out2, "quant.sf"))
    assert q2["NumReads"].sum() > 2800
    import json
    lf = json.load(open(os.path.join(out2, "lib_format_counts.json")))
    assert lf["expected_format"] == "ISF"
    assert lf["ISR"] > 10 * max(lf["ISF"], 1)
