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
