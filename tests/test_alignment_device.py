"""Device error model (errormodel_device.py) parity vs the numpy walk.

The device model is a functional twin of AlignmentErrorModel
(reference AlignmentModel.hpp:10-84): same transition counts, same
fg-bg likelihoods, on a fixed (records, columns) grid instead of the
ragged host expansion. These tests pin bit-level agreement on BAMs with
indels, soft/hard clips, and grid-overflow records (numpy fallback)."""

import os

import numpy as np
import pytest


def _make_bam(tmp_path, records_spec, names, lens):
    from salmon_tpu.alignment import bamio
    path = str(tmp_path / "em.bam")
    bamio.write_bam(path, names, lens, records_spec)
    return path


@pytest.fixture
def targets(sample_data_dir):
    from salmon_tpu.io.fasta import load_transcripts
    records, _ = load_transcripts(
        os.path.join(sample_data_dir, "transcripts.fasta"),
        noclip_polya=True)
    names = [r.name for r in records]
    lens = [r.seq_codes.shape[0] for r in records]
    seq_off = np.zeros(len(names) + 1, np.int64)
    seq_off[1:] = np.cumsum(lens)
    seq = np.concatenate([r.seq_codes for r in records])
    return names, np.asarray(lens, np.int64), seq, seq_off, records


def _spec_reads(records, rng, n=200, with_indels=True):
    """Synthesize single-end records with mixed CIGARs."""
    from salmon_tpu.utils.dna import decode_seq
    specs = []
    for i in range(n):
        tid = int(rng.integers(0, len(records)))
        codes = records[tid].seq_codes
        L = codes.shape[0]
        rl = int(rng.integers(40, 90))
        pos = int(rng.integers(0, max(L - rl - 20, 1)))
        kind = int(rng.integers(0, 5)) if with_indels else 0
        if kind == 0:                       # pure match w/ mismatches
            seq = codes[pos:pos + rl].copy()
            for p in rng.integers(0, rl, size=3):
                seq[p] = (seq[p] + 1) % 4
            cig = f"{rl}M"
        elif kind == 1:                     # deletion
            d = int(rng.integers(1, 5))
            seq = np.concatenate([codes[pos:pos + rl // 2],
                                  codes[pos + rl // 2 + d:pos + rl + d]
                                  [:rl - rl // 2]])
            cig = f"{rl // 2}M{d}D{rl - rl // 2}M"
        elif kind == 2:                     # insertion
            ins = int(rng.integers(1, 5))
            seq = np.concatenate([
                codes[pos:pos + rl // 2],
                rng.integers(0, 4, size=ins).astype(codes.dtype),
                codes[pos + rl // 2:pos + rl - ins]])
            cig = f"{rl // 2}M{ins}I{rl - rl // 2 - ins}M"
        elif kind == 3:                     # soft clips both ends
            sc = int(rng.integers(1, 8))
            core = rl - 2 * sc
            seq = np.concatenate([
                rng.integers(0, 4, size=sc).astype(codes.dtype),
                codes[pos:pos + core],
                rng.integers(0, 4, size=sc).astype(codes.dtype)])
            cig = f"{sc}S{core}M{sc}S"
        else:                               # hard clip (consumes none)
            seq = codes[pos:pos + rl].copy()
            cig = f"5H{rl}M"
        specs.append(dict(
            name=f"r{i}", refid=tid, pos=pos, flag=0,
            cigar=cig, seq=decode_seq(seq), mate_refid=-1, mate_pos=-1,
            tlen=0, tags={"AS": 2 * len(seq), "NM": 3}))
    return specs


def _read_batch(path):
    from salmon_tpu.alignment.bamio import BamReader
    rdr = BamReader(path)
    batches = list(rdr.batches())
    rdr.close()
    assert len(batches) == 1
    return batches[0]


def test_device_counts_and_ll_match_numpy(tmp_path, targets):
    from salmon_tpu.alignment.errormodel import (AlignmentErrorModel,
                                                 expand_batch)
    from salmon_tpu.alignment.errormodel_device import \
        DeviceAlignmentErrorModel

    names, tlens, seq, seq_off, records = targets
    rng = np.random.default_rng(7)
    specs = _spec_reads(records, rng, n=300)
    path = _make_bam(tmp_path, specs, names, list(tlens))
    b = _read_batch(path)
    ref_map = np.arange(len(names), dtype=np.int64)
    sel = np.arange(b.n)
    w = rng.random(b.n).astype(np.float64)

    host = AlignmentErrorModel()
    cols = expand_batch(b, sel, ref_map, seq, seq_off, tlens)
    host.update(cols, w, 0)
    host.normalize()
    ll_host = host.log_likelihood(cols, b.n, 0)

    dev = DeviceAlignmentErrorModel(seq, seq_off, tlens)
    dev.update(b, sel, ref_map, w, 0)
    dev.normalize()
    ll_dev = dev.log_likelihood(b, sel, ref_map, 0)

    np.testing.assert_allclose(
        np.asarray(dev.counts[0], np.float64), host.counts[0],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ll_dev, ll_host, rtol=1e-3, atol=1e-3)


def test_device_grid_overflow_falls_back(tmp_path, targets):
    """Records with >16 CIGAR ops route through the numpy walk and
    still merge exactly."""
    from salmon_tpu.alignment.errormodel import (AlignmentErrorModel,
                                                 expand_batch)
    from salmon_tpu.alignment.errormodel_device import \
        DeviceAlignmentErrorModel
    from salmon_tpu.utils.dna import decode_seq

    names, tlens, seq, seq_off, records = targets
    rng = np.random.default_rng(3)
    specs = _spec_reads(records, rng, n=50)
    # one record with 21 ops (alternating 3M1I), read len 63+21
    codes = records[0].seq_codes
    segs, s = [], 10
    seqparts = []
    for _ in range(10):
        segs.append("5M1I")
        seqparts.append(codes[s:s + 5])
        seqparts.append(rng.integers(0, 4, size=1).astype(codes.dtype))
        s += 5
    segs.append("5M")
    seqparts.append(codes[s:s + 5])
    specs.append(dict(
        name="long", refid=0, pos=10, flag=0,
        cigar="".join(segs), seq=decode_seq(np.concatenate(seqparts)),
        mate_refid=-1, mate_pos=-1, tlen=0, tags={"AS": 100, "NM": 10}))
    path = _make_bam(tmp_path, specs, names, list(tlens))
    b = _read_batch(path)
    assert int(b.cigar_n.max()) > 16
    ref_map = np.arange(len(names), dtype=np.int64)
    sel = np.arange(b.n)
    w = np.ones(b.n)

    host = AlignmentErrorModel()
    cols = expand_batch(b, sel, ref_map, seq, seq_off, tlens)
    host.update(cols, w, 1)
    host.normalize()
    ll_host = host.log_likelihood(cols, b.n, 1)

    dev = DeviceAlignmentErrorModel(seq, seq_off, tlens)
    dev.update(b, sel, ref_map, w, 1)
    dev.normalize()
    ll_dev = dev.log_likelihood(b, sel, ref_map, 1)

    np.testing.assert_allclose(
        np.asarray(dev.counts[1], np.float64), host.counts[1],
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ll_dev, ll_host, rtol=1e-3, atol=1e-3)


def test_alignment_quant_device_matches_host(tmp_path, sample_data_dir,
                                             targets, monkeypatch):
    """End-to-end -a quant: device vs SALMON_TPU_HOST_ERRMODEL=1 give
    the same quant.sf."""
    import types

    from salmon_tpu.alignment.quant import quantify_alignments
    from salmon_tpu.constants import SalmonDefaults
    from salmon_tpu.utils.dna import decode_seq

    names, tlens, seq, seq_off, records = targets
    rng = np.random.default_rng(11)
    # paired fragments from the sample reads
    specs = []
    for i in range(400):
        tid = int(rng.integers(0, len(records)))
        codes = records[tid].seq_codes
        L = codes.shape[0]
        fl = min(int(rng.integers(180, 320)), L - 2)
        pos = int(rng.integers(0, L - fl))
        rl = 76
        s1 = codes[pos:pos + rl]
        from salmon_tpu.utils.dna import revcomp_codes
        s2 = revcomp_codes(codes[pos + fl - rl:pos + fl])
        nm = f"f{i}"
        specs.append(dict(name=nm, refid=tid, pos=pos,
                          flag=0x1 | 0x40 | 0x20, cigar=f"{rl}M",
                          seq=decode_seq(s1), mate_refid=tid,
                          mate_pos=pos + fl - rl, tlen=fl,
                          tags={"AS": 2 * rl, "NM": 0}))
        specs.append(dict(name=nm, refid=tid, pos=pos + fl - rl,
                          flag=0x1 | 0x80 | 0x10, cigar=f"{rl}M",
                          seq=decode_seq(s2), mate_refid=tid,
                          mate_pos=pos, tlen=-fl,
                          tags={"AS": 2 * rl, "NM": 0}))
    path = _make_bam(tmp_path, specs, names, list(tlens))

    def run(out, host_env):
        if host_env:
            monkeypatch.setenv("SALMON_TPU_HOST_ERRMODEL", "1")
        else:
            monkeypatch.delenv("SALMON_TPU_HOST_ERRMODEL",
                               raising=False)
        args = types.SimpleNamespace(
            alignments=[path],
            targets=os.path.join(sample_data_dir, "transcripts.fasta"),
            libType="IU", output=out, noErrorModel=False, ont=False,
            scoreExp=1.0, numPreAuxModelSamples=5000, dumpEq=False,
            dumpEqWeights=False, geneMap=None, sampleOut=False,
            sampleUnaligned=False, writeUnmappedNames=False,
            seed=271828)
        assert quantify_alignments(args, SalmonDefaults(), {}) == 0
        got = {}
        with open(os.path.join(out, "quant.sf")) as fh:
            next(fh)
            for ln in fh:
                f = ln.split("\t")
                got[f[0]] = float(f[4])
        return got

    dev = run(str(tmp_path / "qd"), False)
    host = run(str(tmp_path / "qh"), True)
    for nm in host:
        assert dev[nm] == pytest.approx(host[nm], rel=1e-3, abs=0.05)
