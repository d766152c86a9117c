"""Forgetting-mass schedule and unmapped-names side output."""

import os

import numpy as np
import pytest

from salmon_tpu.quant import ForgettingMass


def test_forgetting_mass_schedule():
    """Matches the reference recurrence: logMass_t += ff*log(t-1) -
    log(t^ff - 1); mass is increasing in t and mass_1 = 1."""
    fm = ForgettingMass(0.65)
    masses = [np.exp(fm.next_log_mass()) for _ in range(50)]
    assert masses[0] == pytest.approx(1.0)
    assert all(b >= a for a, b in zip(masses, masses[1:]))
    # closed-form check at t=2: logMass = 0.65*log(1) - log(2^0.65 - 1)
    assert masses[1] == pytest.approx(1.0 / (2 ** 0.65 - 1))


def test_write_unmapped_names(tmp_path, sample_data_dir):
    from salmon_tpu.cli import main

    idx = str(tmp_path / "idx")
    assert main(["index", "-t",
                 os.path.join(sample_data_dir, "transcripts.fasta"),
                 "-i", idx, "-k", "25"]) == 0
    # append one junk read pair that cannot map
    r1 = tmp_path / "r1.fastq"
    r2 = tmp_path / "r2.fastq"
    with open(os.path.join(sample_data_dir, "reads_1.fastq")) as fh:
        head = "".join([next(fh) for _ in range(400)])
    r1.write_text(head + "@junk:read\n" + "A" * 50 + "\n+\n" + "I" * 50
                  + "\n")
    with open(os.path.join(sample_data_dir, "reads_2.fastq")) as fh:
        head2 = "".join([next(fh) for _ in range(400)])
    r2.write_text(head2 + "@junk:read\n" + "C" * 50 + "\n+\n" + "I" * 50
                  + "\n")
    out = str(tmp_path / "q")
    assert main(["quant", "-i", idx, "-l", "IU", "-1", str(r1),
                 "-2", str(r2), "-o", out, "--writeUnmappedNames",
                 "-q"]) == 0
    path = os.path.join(out, "aux_info", "unmapped_names.txt")
    assert os.path.exists(path)
    lines = open(path).read().strip().split("\n")
    assert any(ln.startswith("junk:read") and ln.endswith(" u")
               for ln in lines if ln)


def test_write_mappings_sam(tmp_path, sample_data_dir):
    from salmon_tpu.cli import main

    idx = str(tmp_path / "idx2")
    assert main(["index", "-t",
                 os.path.join(sample_data_dir, "transcripts.fasta"),
                 "-i", idx, "-k", "25"]) == 0
    out = str(tmp_path / "q2")
    sam = str(tmp_path / "map.sam")
    assert main(["quant", "-i", idx, "-l", "IU",
                 "-1", os.path.join(sample_data_dir, "reads_1.fastq"),
                 "-2", os.path.join(sample_data_dir, "reads_2.fastq"),
                 "-o", out, "--writeMappings", sam, "-q"]) == 0
    lines = open(sam).read().strip().split("\n")
    hdr = [ln for ln in lines if ln.startswith("@")]
    recs = [ln for ln in lines if not ln.startswith("@")]
    assert len(hdr) == 2 + 15  # @HD + 15 @SQ + @PG
    assert len(recs) == 2 * 10000  # every pair mapped -> 2 records
    # most records map to the truth transcript (multimappers may tie-
    # break onto paralogs); truth name = num:txp:fragstart:fraglen
    match_txp = 0
    pos_close = 0
    checked = 0
    for r1, r2 in zip(recs[:2000:2], recs[1:2000:2]):
        f1 = r1.split("\t")
        f2 = r2.split("\t")
        parts = f1[0].split(":")
        checked += 1
        if f1[2] == parts[1]:
            match_txp += 1
            frag_left = min(int(f1[3]), int(f2[3])) - 1
            if abs(frag_left - int(parts[2])) <= 2:
                pos_close += 1
    assert match_txp / checked >= 0.85
    assert pos_close / max(match_txp, 1) >= 0.95


def test_orphan_rescue(tmp_path, sample_data_dir):
    """A pair whose right mate is error-riddled (unseedable) but
    alignable gets rescued when --recoverOrphans is on."""
    import numpy as np
    from salmon_tpu.index.builder import build_index
    from salmon_tpu.mapping.pipeline import (MapperConfig,
                                             device_index_arrays,
                                             map_paired_batch)
    from salmon_tpu.models.fld import FragmentLengthDistribution
    from salmon_tpu.utils import libformat
    from salmon_tpu.utils.dna import decode_seq, revcomp_codes
    from salmon_tpu.io.fastq import pack_seqs
    import jax.numpy as jnp

    idx = build_index(os.path.join(sample_data_dir, "transcripts.fasta"),
                      k=31)
    rng = np.random.default_rng(0)
    # rescue compaction budgets R // 4 problems per batch: keep the
    # orphan count under it
    R, RL = 160, 76
    s1, s2 = [], []
    for i in range(32):
        tid = int(rng.integers(0, idx.num_valid_targets))
        codes = idx.transcript_codes(tid)
        L = codes.shape[0]
        fl = 250
        start = int(rng.integers(0, L - fl))
        left = codes[start:start + RL].copy()
        right = revcomp_codes(codes[start + fl - RL:start + fl]).copy()
        # kill every seed of the right mate: a mismatch every 12 bases
        # (k=31 windows all broken) but alignment still scores >0.65
        for p in range(5, RL, 12):
            right[p] = (right[p] + 1) % 4
        s1.append(decode_seq(left).encode())
        s2.append(decode_seq(right).encode())
    c1, l1 = pack_seqs(s1, R, RL)
    c2, l2 = pack_seqs(s2, R, RL)
    batch = {"codes_l": jnp.asarray(c1), "lengths_l": jnp.asarray(l1),
             "codes_r": jnp.asarray(c2), "lengths_r": jnp.asarray(l2)}
    dev = device_index_arrays(idx)
    fld = FragmentLengthDistribution(max_val=1000)
    flp = jnp.asarray(fld.log_pmf(), jnp.float32)
    fmt = libformat.parse_library_format("IU")
    cp = jnp.asarray(libformat.paired_compat_table(fmt))
    co = jnp.asarray(libformat.orphan_compat_table(fmt))

    cfg_off = MapperConfig.from_index(idx)
    out_off = map_paired_batch(batch, dev, cfg_off, flp, cp, co)
    cfg_on = MapperConfig.from_index(idx, recover_orphans=True)
    out_on = map_paired_batch(batch, dev, cfg_on, flp, cp, co)

    assert int(out_off["num_paired"]) < 5       # seeds destroyed
    assert int(out_on["num_orphans_rescued"]) >= 25
    assert int(out_on["num_paired"]) >= 25      # upgraded to paired


def test_ambig_frag_length_prob():
    """The LogCMFCache::getAmbigFragLengthProb analog: single-end hits
    near the 3' (fw) / 5' (rc) end must be penalized by the mass of
    fragment lengths that no longer fit (DistributionUtils.cpp:151-172)."""
    import jax.numpy as jnp
    from salmon_tpu.mapping.pipeline import _fld_inputs, _filter_and_weight
    from salmon_tpu.mapping.pipeline import MapperConfig
    from salmon_tpu.models.fld import FragmentLengthDistribution

    fld = FragmentLengthDistribution(max_val=1000)
    logpmf = jnp.asarray(fld.log_pmf(), jnp.float32)
    logcmf = jnp.asarray(fld.log_cmf(), jnp.float32)
    fld_d = {"logpmf": logpmf, "logcmf": logcmf, "mode": jnp.int32(1)}

    cfg = MapperConfig(k=25, n_slots=64, max_probes=4,
                       first_decoy_index=10, num_txps=10)
    R, T2 = 2, 2
    # row 0: fw read at pos 10 vs pos 900 on a 1000bp txp; the pos-10 hit
    # leaves room for any fragment, pos-900 leaves only 100bp
    joined = {
        "txp": jnp.array([[1, 2], [1, 2]], jnp.int32),
        "score": jnp.array([[30, 30], [30, 30]], jnp.int32),
        "valid": jnp.ones((R, T2), bool),
        "mate_status": jnp.array([3, 3], jnp.int32),  # != MS_PAIRED
        "pos": jnp.array([[10, 900], [10, 900]], jnp.int32),
        "fw": jnp.array([[True, True], [False, False]]),
        "frag_len": jnp.zeros((R, T2), jnp.int32),
        "obs_code": jnp.zeros((R, T2), jnp.int32),
    }
    tlen = jnp.full((R, T2), 1000, jnp.int32)
    rlen = jnp.full((R,), 50, jnp.int32)
    eq_txp, eq_w, frag_ok, aln_valid, wn, _, _ = _filter_and_weight(
        joined, fld_d, jnp.ones(6, bool), jnp.ones((2, 2), bool),
        None, cfg, tlen=tlen, rlen_mapped=rlen, single_end=True)
    w = np.asarray(wn)
    # fw: pos 10 -> maxfl 990 (CMF ~1); pos 900 -> maxfl 100 (CMF ~0
    # under the N(250,25) prior): the near-end hit must lose
    row0 = {int(t): float(x) for t, x in zip(np.asarray(eq_txp)[0], w[0])}
    assert row0[1] > 0.99 and row0[2] < 1e-6, row0
    # rc: pos 900 + rlen 50 -> room 950 upstream (fine); pos 10 -> room
    # 60 upstream (penalized)
    row1 = {int(t): float(x) for t, x in zip(np.asarray(eq_txp)[1], w[1])}
    assert row1[2] > 0.99 and row1[1] < 1e-6, row1


def test_write_orphan_links_and_skip_quant(tmp_path, sample_idx_dir=None):
    """--writeOrphanLinks emits aux_info/orphan_links.txt;
    --skipQuant skips quant.sf but still dumps eq classes."""
    import os
    from salmon_tpu.cli import main

    data = os.path.join(os.path.dirname(__file__), "data")
    idx = str(tmp_path / "idx")
    rc = main(["index", "-t", os.path.join(data, "transcripts.fasta"),
               "-i", idx, "-k", "25"])
    assert rc == 0
    out = str(tmp_path / "q")
    rc = main(["quant", "-i", idx, "-l", "IU",
               "-1", os.path.join(data, "reads_1.fastq"),
               "-2", os.path.join(data, "reads_2.fastq"),
               "-o", out, "--writeOrphanLinks", "--skipQuant",
               "--dumpEqWeights", "-q"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "aux_info",
                                       "orphan_links.txt"))
    assert not os.path.exists(os.path.join(out, "quant.sf"))
    assert os.path.exists(os.path.join(out, "aux_info",
                                       "eq_classes.txt.gz"))


def test_mimic_bt2_presets():
    from salmon_tpu.cli import build_parser, _opts_from_args
    import pytest as _pytest

    ap = build_parser()
    args = ap.parse_args(["quant", "-i", "x", "-o", "y", "--mimicBT2"])
    o = _opts_from_args(args)
    assert o.gap_open_penalty == 5 and o.gap_extend_penalty == 3
    assert o.max_read_occs == 1000 and o.discard_orphans
    args = ap.parse_args(["quant", "-i", "x", "-o", "y",
                          "--mimicStrictBT2"])
    o = _opts_from_args(args)
    assert o.min_score_fraction == 0.8 and o.match_score == 1
    args = ap.parse_args(["quant", "-i", "x", "-o", "y", "--mimicBT2",
                          "--mimicStrictBT2"])
    with _pytest.raises(SystemExit):
        _opts_from_args(args)
    args = ap.parse_args(["quant", "-i", "x", "-o", "y",
                          "--hitFilterPolicy", "BEFORE"])
    with _pytest.raises(SystemExit):
        _opts_from_args(args)


def test_aux_target_file(tmp_path):
    """--auxTargetFile marks targets to skip bias correction and dumps
    aux_target_ids.json (reference markAuxiliaryTargets)."""
    import json
    import os
    from salmon_tpu.cli import main

    data = os.path.join(os.path.dirname(__file__), "data")
    idx = str(tmp_path / "idx")
    rc = main(["index", "-t", os.path.join(data, "transcripts.fasta"),
               "-i", idx, "-k", "25"])
    assert rc == 0
    # first two transcript names from the index
    from salmon_tpu.index.builder import load_index
    index = load_index(idx)
    auxf = str(tmp_path / "aux.txt")
    with open(auxf, "w") as fh:
        fh.write("\n".join(index.names[:2]) + "\n")
    out = str(tmp_path / "q")
    rc = main(["quant", "-i", idx, "-l", "IU",
               "-1", os.path.join(data, "reads_1.fastq"),
               "-2", os.path.join(data, "reads_2.fastq"),
               "-o", out, "--auxTargetFile", auxf, "-q"])
    assert rc == 0
    ids = json.load(open(os.path.join(out, "aux_info",
                                      "aux_target_ids.json")))
    assert ids["aux_target_ids"] == [0, 1]
