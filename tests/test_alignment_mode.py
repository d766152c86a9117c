"""Alignment-based mode: synthesize a BAM from the sample reads' encoded
ground truth, quantify with -a, and check accuracy + native/python reader
parity."""

import collections
import os

import numpy as np
import pytest

from salmon_tpu.alignment import bamio


def _truth_alignments(sample_data_dir):
    """Build perfect paired alignments from read names
    (readnum:txp:pos:fragend)."""
    recs = []
    with open(os.path.join(sample_data_dir, "reads_1.fastq")) as f1, \
            open(os.path.join(sample_data_dir, "reads_2.fastq")) as f2:
        while True:
            h1 = f1.readline()
            if not h1:
                break
            s1 = f1.readline().strip()
            f1.readline()
            f1.readline()
            f2.readline()
            s2 = f2.readline().strip()
            f2.readline()
            f2.readline()
            name = h1[1:].strip().split()[0]
            parts = name.split(":")
            txp, pos, fend = parts[1], int(parts[2]), int(parts[3])
            recs.append((name, txp, pos, fend, s1, s2))
    return recs


@pytest.fixture(scope="module")
def truth_bam(tmp_path_factory, sample_data_dir):
    from salmon_tpu.io.fasta import load_transcripts
    records, _ = load_transcripts(
        os.path.join(sample_data_dir, "transcripts.fasta"),
        noclip_polya=True)
    names = [r.name for r in records]
    lens = [r.seq_codes.shape[0] for r in records]
    tid = {nm: i for i, nm in enumerate(names)}

    alns = _truth_alignments(sample_data_dir)
    bam_recs = []
    for name, txp, pos, fend, s1, s2 in alns:
        rid = tid[txp]
        L1, L2 = len(s1), len(s2)
        tlen = fend - pos + 1
        p1, p2 = pos, fend - L2 + 1
        bam_recs.append(dict(
            name=name, refid=rid, pos=p1, flag=0x1 | 0x40 | 0x20,
            cigar=f"{L1}M", seq=s1, mate_refid=rid, mate_pos=p2,
            tlen=tlen, tags={"AS": 2 * L1, "NM": 0}))
        bam_recs.append(dict(
            name=name, refid=rid, pos=p2, flag=0x1 | 0x80 | 0x10,
            cigar=f"{L2}M", seq=s2, mate_refid=rid, mate_pos=p1,
            tlen=-tlen, tags={"AS": 2 * L2, "NM": 0}))
    path = str(tmp_path_factory.mktemp("bam") / "truth.bam")
    bamio.write_bam(path, names, lens, bam_recs)
    return path, names


def test_native_and_python_readers_agree(truth_bam):
    path, names = truth_bam
    lib = bamio.native_lib()
    assert lib is not None, "native BAM reader failed to build"
    r_nat = bamio.BamReader(path)
    assert r_nat._lib is not None
    b_nat = next(r_nat.batches())
    py = bamio._PyBam(path)
    b_py = next(py.batches(r_nat.batch_records))
    assert r_nat.ref_names == py.ref_names
    assert b_nat.n == b_py.n == 20000
    for f in ("refid", "pos", "flag", "mapq", "mate_pos", "tlen",
              "read_len", "as_tag", "nm_tag", "name_hash"):
        np.testing.assert_array_equal(
            getattr(b_nat, f)[:b_nat.n], getattr(b_py, f)[:b_py.n], f)
    ns = b_nat.n - 1
    seq_total = int(b_nat.seq_off[ns] + b_nat.read_len[ns])
    assert seq_total == int(b_py.seq_off[ns] + b_py.read_len[ns])
    np.testing.assert_array_equal(b_nat.seq_buf[:seq_total],
                                  b_py.seq_buf[:seq_total])
    cig_total = int(b_nat.cigar_off[ns] + b_nat.cigar_n[ns])
    np.testing.assert_array_equal(b_nat.cigar_op[:cig_total],
                                  b_py.cigar_op[:cig_total])
    np.testing.assert_array_equal(b_nat.cigar_oplen[:cig_total],
                                  b_py.cigar_oplen[:cig_total])
    r_nat.close()


def test_alignment_mode_quant(truth_bam, sample_data_dir, tmp_path):
    from salmon_tpu.cli import main
    from salmon_tpu.io.writers import read_quant_sf
    from scipy.stats import spearmanr

    path, names = truth_bam
    out = str(tmp_path / "alnq")
    rc = main(["quant", "-t",
               os.path.join(sample_data_dir, "transcripts.fasta"),
               "-l", "A", "-a", path, "-o", out, "-q"])
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
    # perfect unique alignments -> essentially exact counts
    rho = spearmanr(t, e).statistic
    assert rho >= 0.999, f"alignment-mode Spearman {rho}"
    np.testing.assert_allclose(e.sum(), 10000, rtol=0.01)
    import json
    with open(os.path.join(out, "aux_info", "meta_info.json")) as fh:
        meta = json.load(fh)
    assert meta["mapping_type"] == "alignment"
    assert meta["num_processed"] == 10000


def test_sample_out(truth_bam, sample_data_dir, tmp_path):
    """--sampleOut writes a readable posterior-sampled BAM with one
    record pair per fragment."""
    from salmon_tpu.cli import main

    path, names = truth_bam
    out = str(tmp_path / "so")
    rc = main(["quant", "-t",
               os.path.join(sample_data_dir, "transcripts.fasta"),
               "-l", "IU", "-a", path, "-o", out, "--sampleOut", "-q"])
    assert rc == 0
    ps = os.path.join(out, "postSample.bam")
    assert os.path.exists(ps)
    rdr = bamio.BamReader(ps, want_names=True)
    total = 0
    seen_names = set()
    for b in rdr.batches():
        total += b.n
        for nm in (b.names or [])[:5]:
            seen_names.add(nm)
    rdr.close()
    assert total == 2 * 10000  # one record pair per fragment
    assert len(seen_names) > 0


def test_alignment_mode_multimappers(sample_data_dir, tmp_path):
    """Multimapped BAM records: fragments aligning to two paralogs split
    mass via the error model + EM, totals conserved."""
    from salmon_tpu.cli import main
    from salmon_tpu.io.writers import read_quant_sf

    rng = np.random.default_rng(3)
    L = 200
    base = rng.integers(0, 4, 1000).astype(np.uint8)
    # two identical paralogs + one distinct transcript
    seqs = {"PARA1": base, "PARA2": base.copy(),
            "SOLO": rng.integers(0, 4, 1000).astype(np.uint8)}
    fa = tmp_path / "t.fa"
    with open(fa, "w") as fh:
        for nm, s in seqs.items():
            fh.write(f">{nm}\n" + "".join("ACGT"[c] for c in s) + "\n")
    names = list(seqs)
    recs = []
    for i in range(300):
        s = int(rng.integers(0, 1000 - 80))
        seq = "".join("ACGT"[c] for c in base[s:s + 80])
        # two records for the same read: hits both paralogs
        for rid in (0, 1):
            recs.append(dict(name=f"m{i}", refid=rid, pos=s,
                             flag=0x100 if rid == 1 else 0,
                             cigar="80M", seq=seq, tags={"AS": 160}))
    for i in range(100):
        s = int(rng.integers(0, 1000 - 80))
        seq = "".join("ACGT"[c] for c in seqs["SOLO"][s:s + 80])
        recs.append(dict(name=f"u{i}", refid=2, pos=s, flag=0,
                         cigar="80M", seq=seq, tags={"AS": 160}))
    bam = str(tmp_path / "m.bam")
    bamio.write_bam(bam, names, [1000, 1000, 1000], recs)
    out = str(tmp_path / "q")
    rc = main(["quant", "-t", str(fa), "-l", "U", "-a", bam, "-o", out,
               "-q"])
    assert rc == 0
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    est = dict(zip(q["Name"], q["NumReads"]))
    np.testing.assert_allclose(est["SOLO"], 100, atol=1.5)
    # identical paralogs split the 300 multimapped reads ~evenly
    np.testing.assert_allclose(est["PARA1"] + est["PARA2"], 300,
                               atol=1.5)
    assert abs(est["PARA1"] - est["PARA2"]) < 60


def test_sample_unaligned(sample_data_dir, tmp_path):
    """--sampleUnaligned passes unassignable fragments through."""
    from salmon_tpu.cli import main
    from salmon_tpu.io.fasta import load_transcripts

    records, _ = load_transcripts(
        os.path.join(sample_data_dir, "transcripts.fasta"),
        noclip_polya=True)
    names = [r.name for r in records]
    lens = [r.seq_codes.shape[0] for r in records]
    rng = np.random.default_rng(9)
    recs = []
    for i in range(200):
        tid = int(rng.integers(0, len(names)))
        s = int(rng.integers(0, lens[tid] - 60))
        seq = "".join("ACGT"[c]
                      for c in records[tid].seq_codes[s:s + 60])
        recs.append(dict(name=f"a{i}", refid=tid, pos=s, flag=0,
                         cigar="60M", seq=seq, tags={"AS": 120}))
    # 20 unmapped records (flag 0x4, refid -1)
    for i in range(20):
        recs.append(dict(name=f"un{i}", refid=-1, pos=-1, flag=0x4,
                         cigar="", seq="ACGT" * 15))
    bam = str(tmp_path / "u.bam")
    bamio.write_bam(bam, names, lens, recs)
    out = str(tmp_path / "q")
    rc = main(["quant", "-t",
               os.path.join(sample_data_dir, "transcripts.fasta"),
               "-l", "U", "-a", bam, "-o", out, "--sampleOut",
               "--sampleUnaligned", "-q"]) 
    assert rc == 0
    rdr = bamio.BamReader(os.path.join(out, "postSample.bam"),
                          want_names=True)
    total = 0
    unmapped_seen = 0
    for b in rdr.batches():
        total += b.n
        for j in range(b.n):
            if b.flag[j] & 0x4:
                unmapped_seen += 1
    rdr.close()
    assert total == 220
    assert unmapped_seen == 20


def test_batch_boundary_keeps_name_groups(sample_data_dir, tmp_path):
    """A read-name group must never straddle a batch boundary (reference
    BAMQueue keeps a read's records together) — for BOTH readers."""
    from salmon_tpu.io.fasta import load_transcripts

    records, _ = load_transcripts(
        os.path.join(sample_data_dir, "transcripts.fasta"),
        noclip_polya=True)
    names = [r.name for r in records]
    lens = [r.seq_codes.shape[0] for r in records]
    rng = np.random.default_rng(7)
    recs = []
    # 40 fragments x 3 alignments each = 120 records; cap=32 puts
    # boundaries mid-group repeatedly
    for i in range(40):
        for j in range(3):
            tid = int(rng.integers(0, len(names)))
            s = int(rng.integers(0, lens[tid] - 60))
            seq = "".join("ACGT"[c]
                          for c in records[tid].seq_codes[s:s + 60])
            recs.append(dict(name=f"g{i}", refid=tid, pos=s, flag=0,
                             cigar="60M", seq=seq, tags={"AS": 120}))
    bam = str(tmp_path / "grp.bam")
    bamio.write_bam(bam, names, lens, recs)

    def group_spans(batches):
        spans = []
        total = 0
        for b in batches:
            total += b.n
            h = b.name_hash[:b.n]
            assert b.n > 0
            spans.append((h[0], h[-1]))
            # every group within a batch must be complete: count runs
            _, counts = np.unique(h, return_counts=True)
            assert (counts == 3).all(), "split name group inside batch"
        # no group may span adjacent batches
        for (_, last), (first, _) in zip(spans, spans[1:]):
            assert last != first, "name group straddles batch boundary"
        assert total == 120

    r_nat = bamio.BamReader(bam, batch_records=32)
    if r_nat._lib is not None:
        group_spans(r_nat.batches())
        r_nat.close()
    py = bamio._PyBam(bam)
    group_spans(py.batches(32))


def test_alignment_mode_gibbs_and_bias(truth_bam, sample_data_dir,
                                       tmp_path):
    """-a mode shares the full finalize path: Gibbs samples and bias
    correction now run for alignment inputs too (reference
    AlignmentPipelineStages.cpp:61-90)."""
    from salmon_tpu.cli import main
    from salmon_tpu.io.writers import read_bootstraps, read_quant_sf

    path, names = truth_bam
    out = str(tmp_path / "ag")
    rc = main(["quant", "-t",
               os.path.join(sample_data_dir, "transcripts.fasta"),
               "-l", "IU", "-a", path, "-o", out,
               "--numGibbsSamples", "8", "--gcBias", "-q"])
    assert rc == 0
    q = read_quant_sf(os.path.join(out, "quant.sf"))
    nms, samples = read_bootstraps(out)
    assert samples.shape == (8, len(q["Name"]))
    # sample means track the point estimates
    m = samples.mean(axis=0)
    big = q["NumReads"] > 50
    assert np.allclose(m[big], q["NumReads"][big], rtol=0.35)
    import json
    meta = json.load(open(os.path.join(out, "aux_info",
                                       "meta_info.json")))
    assert meta["mapping_type"] == "alignment"
    assert meta["samp_type"] == "gibbs"


def test_alignment_mode_unmapped_names(sample_data_dir, tmp_path):
    """--writeUnmappedNames in -a mode records fragments with no usable
    alignment (reference OutputUnmappedFilter role)."""
    from salmon_tpu.cli import main
    from salmon_tpu.io.fasta import load_transcripts

    records, _ = load_transcripts(
        os.path.join(sample_data_dir, "transcripts.fasta"),
        noclip_polya=True)
    names = [r.name for r in records]
    lens = [r.seq_codes.shape[0] for r in records]
    rng = np.random.default_rng(4)
    recs = []
    for i in range(50):
        tid = int(rng.integers(0, len(names)))
        st = int(rng.integers(0, lens[tid] - 60))
        seq = "".join("ACGT"[c]
                      for c in records[tid].seq_codes[st:st + 60])
        recs.append(dict(name=f"m{i}", refid=tid, pos=st, flag=0,
                         cigar="60M", seq=seq, tags={"AS": 120}))
    for i in range(7):
        recs.append(dict(name=f"um{i}", refid=-1, pos=-1, flag=0x4,
                         cigar="", seq="ACGT" * 15))
    bam = str(tmp_path / "u2.bam")
    bamio.write_bam(bam, names, lens, recs)
    out = str(tmp_path / "qo")
    rc = main(["quant", "-t",
               os.path.join(sample_data_dir, "transcripts.fasta"),
               "-l", "U", "-a", bam, "-o", out,
               "--writeUnmappedNames", "-q"])
    assert rc == 0
    lines = open(os.path.join(out, "aux_info",
                              "unmapped_names.txt")).read().split()
    got = {ln for ln in lines if ln.startswith("um")}
    assert got == {f"um{i}" for i in range(7)}


def test_sample_out_zw_uses_error_model(tmp_path):
    """ZW weights in postSample.bam carry the quantifier's full
    posterior including the trained error-model likelihood
    (Sampler.hpp:342). With --skipQuant the abundance term is flat, so
    for a read multimapping to a clean copy and a 10%-diverged copy the
    ZW split is driven by the error model alone: clean picks must get
    ZW well above 0.5 (the pre-fix weight was exactly 0.5)."""
    from salmon_tpu.cli import main

    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, 1000).astype(np.uint8)
    div = base.copy()
    at = rng.choice(1000, 100, replace=False)
    div[at] = (div[at] + rng.integers(1, 4, 100)) % 4
    fa = tmp_path / "t.fa"
    with open(fa, "w") as fh:
        fh.write(">CLEAN\n" + "".join("ACGT"[c] for c in base) + "\n")
        fh.write(">DIVERGED\n" + "".join("ACGT"[c] for c in div) + "\n")
    recs = []
    for i in range(400):
        s = int(rng.integers(0, 1000 - 80))
        seq = "".join("ACGT"[c] for c in base[s:s + 80])
        for rid in (0, 1):
            recs.append(dict(name=f"m{i}", refid=rid, pos=s,
                             flag=0x100 if rid == 1 else 0,
                             cigar="80M", seq=seq, tags={"AS": 160}))
    bam = str(tmp_path / "m.bam")
    bamio.write_bam(bam, ["CLEAN", "DIVERGED"], [1000, 1000], recs)
    out = str(tmp_path / "q")
    rc = main(["quant", "-t", str(fa), "-l", "U", "-a", bam, "-o", out,
               "--sampleOut", "--skipQuant", "-q"])
    assert rc == 0
    rdr = bamio.BamReader(os.path.join(out, "postSample.bam"),
                          want_names=True)
    zw_clean, zw_div, n = [], [], 0
    for b in rdr.batches():
        n += b.n
        for j in range(b.n):
            zw = b.zw_tag[j] if hasattr(b, "zw_tag") else None
            if zw is None:
                continue
            (zw_clean if b.refid[j] == 0 else zw_div).append(float(zw))
    rdr.close()
    assert n == 400
    assert len(zw_clean) + len(zw_div) == 400
    zc = np.asarray(zw_clean)
    assert (zc > 0.5).all() and (zc <= 1.0).all()
    assert zc.mean() > 0.8, zc.mean()
    # the clean copy wins nearly every draw
    assert len(zw_clean) >= 360, len(zw_clean)
