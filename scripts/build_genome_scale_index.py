"""Genome-decoy-scale index-build demonstration (BASELINE config 5).

Generates a ~3.4 Gb input (the bench cache's 200k-transcript synthetic
transcriptome + random ~3 Gb genome-like decoy chromosomes — random
sequence is the WORST case: nearly every k-mer unique), then runs the
partitioned build and reports wall time, peak RSS, and index stats.

Usage: python scripts/build_genome_scale_index.py [decoy_gb]
Env: BENCH_CACHE (default ~/.cache/salmon_tpu_bench); output index in
$BENCH_CACHE/genome_idx (deleted arrays after the stats unless
KEEP_GENOME_IDX=1, to spare disk).
"""

import os
import resource
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
CACHE = os.environ.get(
    "BENCH_CACHE", os.path.join(os.path.expanduser("~"), ".cache",
                                "salmon_tpu_bench"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_decoys(path, n_gb: float, seed=7):
    import numpy as np
    if os.path.exists(path):
        return
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    chrom_mb = 64
    n_chrom = int(n_gb * 1024 / chrom_mb + 0.5)
    log(f"# writing {n_chrom} x {chrom_mb}Mb decoy chromosomes -> {path}")
    with open(path, "wb") as fh:
        for c in range(n_chrom):
            fh.write(f">decoy_chr{c}\n".encode())
            seq = bases[rng.integers(0, 4, chrom_mb * 1024 * 1024)]
            fh.write(seq.tobytes())
            fh.write(b"\n")
    log(f"# decoys written ({os.path.getsize(path) / 1e9:.2f} GB)")


def main():
    decoy_gb = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    txome = os.path.join(CACHE, "txome.fasta")
    if not os.path.exists(txome):
        log("# regenerating the 200k-transcript synthetic txome "
            "(scripts/make_synthetic_txome.py, seed 7)")
        import subprocess
        subprocess.run(
            [sys.executable, os.path.join(HERE, "scripts",
                                          "make_synthetic_txome.py"),
             "--out-dir", CACHE, "--no-reads"], check=True)
    decoys = os.path.join(CACHE, f"decoys_{decoy_gb:g}gb.fasta")
    make_decoys(decoys, decoy_gb)

    from salmon_tpu.index.builder import build_index, save_index

    t0 = time.time()
    # --maxOccsKept analog: repeat k-mers keep their first N records
    # (query-identical for occ_cap <= N; true counts stay in the shard
    # tables for the repetitive filter). Random decoys are nearly all
    # unique so this matters little HERE; real genomes are ~50% repeats.
    kept = int(os.environ.get("GENOME_MAX_OCCS", 64))
    idx = build_index(txome, k=31, decoys_path=decoys,
                      max_occs_kept=kept)
    build_s = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    total_gb = int(idx.seq_offsets[-1]) / 1e9
    log(f"# build: {total_gb:.2f} Gb input, {idx.info['num_kmers'] / 1e9:.2f}G"
        f" kmers, {idx.info['num_occurrences'] / 1e9:.2f}G occurrences in"
        f" {build_s / 60:.1f} min (peak RSS {rss_gb:.1f} GB)")

    out = os.path.join(CACHE, "genome_idx")
    t0 = time.time()
    save_index(idx, out)
    save_s = time.time() - t0
    sz = sum(os.path.getsize(os.path.join(out, f))
             for f in os.listdir(out)) / 1e9
    log(f"# saved {sz:.1f} GB in {save_s / 60:.1f} min -> {out}")
    print({"input_gb": round(total_gb, 2),
           "kmers_g": round(idx.info["num_kmers"] / 1e9, 3),
           "occs_g": round(idx.info["num_occurrences"] / 1e9, 3),
           "decoys": idx.info["num_decoys"],
           "build_min": round(build_s / 60, 1),
           "save_min": round(save_s / 60, 1),
           "peak_rss_gb": round(rss_gb, 1),
           "index_gb": round(sz, 1),
           "tableless": idx.table is None})
    if not os.environ.get("KEEP_GENOME_IDX"):
        import shutil
        shutil.rmtree(out)
        log("# index dir removed (set KEEP_GENOME_IDX=1 to keep)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
