"""Generate a synthetic human-scale transcriptome FASTA + paired reads.

Transcript lengths follow a lognormal fit of human annotation
(median ~1.3kb); gene families get shared paralog blocks so the
multimapping structure resembles real data. Reads are drawn with a
N(250,25) fragment model and 0.5% error. Names encode the truth:
readnum:txp:fragstart:fraglen (the repo's sample-data convention).
"""

import argparse
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def write_fasta(path, names, seqs):
    with open(path, "w") as fh:
        for nm, s in zip(names, seqs):
            fh.write(f">{nm}\n")
            b = BASES[s].tobytes().decode()
            for i in range(0, len(b), 80):
                fh.write(b[i:i + 80] + "\n")


def make_txome(n_txps, seed=7, paralog_frac=0.2):
    rng = np.random.default_rng(seed)
    lens = np.clip(rng.lognormal(7.2, 0.75, n_txps).astype(np.int64),
                   300, 20000)
    seqs = []
    names = []
    i = 0
    while i < n_txps:
        fam = 1
        if rng.random() < paralog_frac:
            fam = int(rng.integers(2, 6))
        fam = min(fam, n_txps - i)
        base = rng.integers(0, 4, int(lens[i])).astype(np.uint8)
        for j in range(fam):
            s = base[:int(lens[i + j])].copy()
            if s.shape[0] < lens[i + j]:
                s = np.concatenate([s, rng.integers(
                    0, 4, int(lens[i + j]) - s.shape[0]).astype(np.uint8)])
            # paralogs diverge ~2%
            if j > 0:
                nmut = max(1, int(0.02 * s.shape[0]))
                at = rng.integers(0, s.shape[0], nmut)
                s[at] = (s[at] + rng.integers(1, 4, nmut)) % 4
            seqs.append(s)
            names.append(f"SYNT{i + j:06d}")
        i += fam
    return names, seqs


def make_reads(names, seqs, n_pairs, read_len=100, seed=11,
               err=0.005):
    rng = np.random.default_rng(seed)
    lens = np.array([s.shape[0] for s in seqs])
    ok = lens >= 350
    p = np.where(ok, lens.astype(np.float64), 0.0)
    # zipf-ish expression
    expr = rng.lognormal(0, 2.0, len(seqs)) * p
    expr /= expr.sum()
    picks = rng.choice(len(seqs), size=n_pairs, p=expr)
    r1, r2 = [], []
    for i, t in enumerate(picks):
        s = seqs[t]
        L = s.shape[0]
        fl = int(np.clip(rng.normal(250, 25), 2 * read_len, L))
        st = int(rng.integers(0, L - fl + 1))
        left = s[st:st + read_len].copy()
        right = s[st + fl - read_len:st + fl].copy()
        right = 3 - right[::-1]  # revcomp
        for r in (left, right):
            ne = rng.binomial(read_len, err)
            if ne:
                at = rng.integers(0, read_len, ne)
                r[at] = (r[at] + rng.integers(1, 4, ne)) % 4
        nm = f"{i}:{names[t]}:{st}:{fl}"
        r1.append((nm, left))
        r2.append((nm, right))
    return r1, r2


def write_fastq(path, reads):
    with open(path, "w") as fh:
        for nm, s in reads:
            b = BASES[s].tobytes().decode()
            fh.write(f"@{nm}\n{b}\n+\n{'I' * len(b)}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--n-txps", type=int, default=200_000)
    ap.add_argument("--n-pairs", type=int, default=200_000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--no-reads", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    names, seqs = make_txome(args.n_txps, seed=args.seed)
    total = sum(s.shape[0] for s in seqs)
    print(f"transcriptome: {len(names)} txps, {total / 1e6:.0f} Mb")
    write_fasta(os.path.join(args.out_dir, "txome.fasta"), names, seqs)
    if args.no_reads:
        return
    r1, r2 = make_reads(names, seqs, args.n_pairs, seed=args.seed + 1)
    write_fastq(os.path.join(args.out_dir, "reads_1.fastq"), r1)
    write_fastq(os.path.join(args.out_dir, "reads_2.fastq"), r2)
    print("reads written")


if __name__ == "__main__":
    main()
