"""Posterior-sampled BAM output (`--sampleOut` / `--sampleUnaligned`).

Reference: salmon::sampler::sampleLibrary (include/salmon/internal/
alignment/Sampler.hpp:342, called from SalmonQuantifyAlignments.cpp:1317):
after quantification, re-walk the alignments and emit ONE record per
fragment, sampled from its alignments with probability proportional to the
final posterior (abundance x alignment weight). Output: postSample.bam in
the output directory.
"""

from __future__ import annotations

import struct

import numpy as np

from salmon_tpu.alignment.bamio import _bgzf_block

_B2C = {0: "A", 1: "C", 2: "G", 3: "T", 4: "N"}


class BamWriter:
    """Streaming BGZF/BAM writer."""

    def __init__(self, path: str, ref_names, ref_lens):
        self._fh = open(path, "wb")
        self._buf = bytearray()
        body = bytearray()
        body += b"BAM\x01"
        text = "".join(f"@SQ\tSN:{n}\tLN:{l}\n"
                       for n, l in zip(ref_names, ref_lens)).encode()
        body += struct.pack("<i", len(text)) + text
        body += struct.pack("<i", len(ref_names))
        for n, l in zip(ref_names, ref_lens):
            nb = n.encode() + b"\0"
            body += struct.pack("<i", len(nb)) + nb + struct.pack(
                "<i", int(l))
        self._buf += body
        self._maybe_flush()

    def _maybe_flush(self, force=False):
        while len(self._buf) >= 60000 or (force and self._buf):
            chunk = bytes(self._buf[:60000])
            del self._buf[:60000]
            self._fh.write(_bgzf_block(chunk))

    def add_record(self, name: bytes, refid: int, pos: int, flag: int,
                   mapq: int, cigar_ops, cigar_lens, seq_codes,
                   mate_refid: int = -1, mate_pos: int = -1,
                   tlen: int = 0, zw: float | None = None):
        nameb = bytes(name) + b"\0"
        lseq = int(seq_codes.shape[0])
        code_of = {0: 1, 1: 2, 2: 4, 3: 8, 4: 15}
        s4 = bytearray()
        for i in range(0, lseq, 2):
            hi = code_of.get(int(seq_codes[i]), 15) << 4
            lo = (code_of.get(int(seq_codes[i + 1]), 15)
                  if i + 1 < lseq else 0)
            s4.append(hi | lo)
        qual = bytes([0xFF] * lseq)
        tags = bytearray()
        if zw is not None:
            tags += b"ZWf" + struct.pack("<f", float(zw))
        n_cig = len(cigar_ops)
        rec = struct.pack(
            "<iiBBHHHiiii", int(refid), int(pos), len(nameb), int(mapq),
            0, n_cig, int(flag), lseq, int(mate_refid), int(mate_pos),
            int(tlen))
        rec += nameb
        rec += b"".join(struct.pack(
            "<I", (int(cl) << 4) | int(co))
            for co, cl in zip(cigar_ops, cigar_lens))
        rec += bytes(s4) + qual + bytes(tags)
        self._buf += struct.pack("<i", len(rec)) + rec
        self._maybe_flush()

    def close(self):
        self._maybe_flush(force=True)
        self._fh.write(_bgzf_block(b""))
        self._fh.close()


def sample_fragments(rng, fid, weights):
    """One sampled alignment index per fragment.

    fid: (n,) sorted fragment ids; weights: (n,) linear posterior
    weights. Returns indices into the flat arrays, one per fragment.
    """
    order = np.argsort(fid, kind="stable")
    f_s = fid[order]
    w_s = np.maximum(weights[order], 0.0)
    starts = np.concatenate([[0], np.nonzero(f_s[1:] != f_s[:-1])[0] + 1])
    counts = np.diff(np.concatenate([starts, [f_s.shape[0]]]))
    tot = np.add.reduceat(w_s, starts)
    cum = np.cumsum(w_s)
    cum_before = np.concatenate([[0], cum])[starts]
    u = rng.random(starts.shape[0]) * np.maximum(tot, 1e-300)
    targets = cum_before + u
    pick = np.searchsorted(cum, targets, side="left")
    pick = np.minimum(pick, starts + counts - 1)
    return order[pick]
