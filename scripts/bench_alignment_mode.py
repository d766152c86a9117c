"""Alignment-mode (-a BAM) throughput benchmark.

Synthesizes a BAM from the bundled sample's read-name ground truth
(repeated REPS times, default 10 -> 100k fragments / 200k records),
then times the full `quantify_alignments` path (native BGZF reader ->
vectorized grouping/weighting -> error model -> EM -> writers) and the
streaming loop alone.

Reference yardstick: alignment mode saturates at ~8-12 threads on the
BAM decompress (doc/source/salmon.rst:83-97); there the bottleneck is
htslib inflate — here it is the same BGZF inflate in native/bamreader.

Usage: python scripts/bench_alignment_mode.py [REPS]
"""

import os
import sys
import tempfile
import time
import types

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
DATA = os.path.join(HERE, "tests", "data")

if os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin can win over the env var; enforce it
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_bam(path, reps):
    from salmon_tpu.alignment import bamio
    from salmon_tpu.io.fasta import load_transcripts

    records, _ = load_transcripts(
        os.path.join(DATA, "transcripts.fasta"), noclip_polya=True)
    names = [r.name for r in records]
    lens = [r.seq_codes.shape[0] for r in records]
    tid = {nm: i for i, nm in enumerate(names)}

    recs = []
    with open(os.path.join(DATA, "reads_1.fastq")) as f1, \
            open(os.path.join(DATA, "reads_2.fastq")) as f2:
        while True:
            h1 = f1.readline()
            if not h1:
                break
            s1 = f1.readline().strip(); f1.readline(); f1.readline()
            f2.readline()
            s2 = f2.readline().strip(); f2.readline(); f2.readline()
            name = h1[1:].strip().split()[0]
            parts = name.split(":")
            recs.append((name, parts[1], int(parts[2]), int(parts[3]),
                         s1, s2))

    bam_recs = []
    n_frags = 0
    for rep in range(reps):
        for name, txp, pos, fend, s1, s2 in recs:
            rid = tid[txp]
            L1, L2 = len(s1), len(s2)
            tlen = fend - pos + 1
            p1, p2 = pos, fend - L2 + 1
            nm = f"{rep}:{name}"
            bam_recs.append(dict(
                name=nm, refid=rid, pos=p1, flag=0x1 | 0x40 | 0x20,
                cigar=f"{L1}M", seq=s1, mate_refid=rid, mate_pos=p2,
                tlen=tlen, tags={"AS": 2 * L1, "NM": 0}))
            bam_recs.append(dict(
                name=nm, refid=rid, pos=p2, flag=0x1 | 0x80 | 0x10,
                cigar=f"{L2}M", seq=s2, mate_refid=rid, mate_pos=p1,
                tlen=-tlen, tags={"AS": 2 * L2, "NM": 0}))
            n_frags += 1
    bamio.write_bam(path, names, lens, bam_recs)
    return n_frags


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tmp = tempfile.mkdtemp(prefix="salmon_tpu_abench_")
    bam = os.path.join(tmp, "bench.bam")
    t0 = time.perf_counter()
    n_frags = build_bam(bam, reps)
    log(f"# built {bam}: {n_frags} fragments "
        f"({os.path.getsize(bam) / 1e6:.1f} MB BGZF, "
        f"{time.perf_counter() - t0:.1f}s)")

    # --- raw reader throughput
    from salmon_tpu.alignment.bamio import BamReader
    t0 = time.perf_counter()
    n_rec = 0
    rdr = BamReader(bam)
    for b in rdr.batches():
        n_rec += b.n
    rdr.close()
    dt = time.perf_counter() - t0
    reader_rate = n_rec / dt
    log(f"# reader: {n_rec} records in {dt:.2f}s = "
        f"{reader_rate / 1e6:.2f}M rec/s")

    # --- full quantify_alignments
    from salmon_tpu.alignment.quant import quantify_alignments
    from salmon_tpu.constants import SalmonDefaults

    out = os.path.join(tmp, "quant")
    args = types.SimpleNamespace(
        alignments=[bam], targets=os.path.join(DATA, "transcripts.fasta"),
        libType="IU", output=out, noErrorModel=False, ont=False,
        scoreExp=1.0, numPreAuxModelSamples=5000, dumpEq=False,
        dumpEqWeights=False, geneMap=None, sampleOut=False,
        sampleUnaligned=False, writeUnmappedNames=False, seed=271828)
    opts = SalmonDefaults()
    t0 = time.perf_counter()
    rc = quantify_alignments(args, opts, cmd_args={"bench": True})
    dt = time.perf_counter() - t0
    assert rc == 0
    log(f"# quantify_alignments: {n_frags} fragments in {dt:.2f}s")
    print(f'{{"metric": "alignment-mode frags/s", '
          f'"value": {n_frags / dt:.1f}, "reader_rec_per_s": '
          f'{reader_rate:.0f}}}')
    log(f"alignment-mode throughput: {n_frags / dt / 1e3:.1f}k frags/s "
        f"(end-to-end incl. error-model training + EM + writers)")


if __name__ == "__main__":
    main()
