"""Host FASTQ streaming into fixed-shape encoded batches.

Reference analog: the FQFeeder FastxParser producer threads feeding
5k-50k-read chunks to workers (src/quant/SalmonQuantify.cpp:2418-2443,
computeReadMiniBatchSize :157-184). Here the producer yields padded
(R, L) uint8 code tensors ready for host->device transfer; raggedness is
resolved on the host so the device program is fixed-shape.
"""

from __future__ import annotations

import dataclasses
import gzip
from typing import Iterator, Optional, Sequence

import numpy as np

from salmon_tpu.utils.dna import encode_seq


@dataclasses.dataclass
class ReadChunk:
    """One fixed-shape chunk of encoded reads (padded with invalid=4)."""
    codes: np.ndarray            # (R, L) uint8
    lengths: np.ndarray          # (R,) int32; 0 for padding rows
    n_valid: int                 # number of real reads in this chunk
    names: Optional[list] = None


@dataclasses.dataclass
class PairedChunk:
    left: ReadChunk
    right: ReadChunk

    @property
    def n_valid(self) -> int:
        return self.left.n_valid


def _open_maybe_gz(path: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _iter_fastq_seqs(path: str, want_names: bool = False):
    """Yield seq bytes (or (name, seq)) from a FASTQ/FASTA file."""
    with _open_maybe_gz(path) as fh:
        first = fh.read(1)
        fh.seek(0)
        if first == b">":  # FASTA reads
            name, chunks = None, []
            for line in fh:
                line = line.rstrip()
                if line.startswith(b">"):
                    if name is not None:
                        seq = b"".join(chunks)
                        yield (name, seq) if want_names else seq
                    name = line[1:].split()[0]
                    chunks = []
                else:
                    chunks.append(line)
            if name is not None:
                seq = b"".join(chunks)
                yield (name, seq) if want_names else seq
            return
        while True:
            hdr = fh.readline()
            if not hdr:
                return
            seq = fh.readline().rstrip()
            fh.readline()  # '+'
            fh.readline()  # quals
            if want_names:
                yield hdr[1:].rstrip().split()[0], seq
            else:
                yield seq


#: length buckets so jit recompiles at most a handful of times for a run
LEN_BUCKETS = (64, 96, 128, 160, 192, 256, 384, 512, 1024)


# ---------------------------------------------------------------------------
# Native chunk reader (native/fastqreader.cpp — the FQFeeder role)

_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    import ctypes
    import os as _os
    so = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))), "native", "libsalmontpu.so")
    if not _os.path.exists(so):
        try:
            import sys as _sys
            _sys.path.insert(0, _os.path.dirname(_os.path.dirname(so)))
            from native.build import build
            so = build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.fastq_open.restype = ctypes.c_void_p
        lib.fastq_open.argtypes = [ctypes.c_char_p]
        lib.fastq_close.argtypes = [ctypes.c_void_p]
        lib.fastq_next_batch.restype = ctypes.c_int64
    except (OSError, AttributeError):
        return None
    _NATIVE = lib
    return lib


class NativeFastqReader:
    """Streams padded (R, L) code batches straight from C++."""

    def __init__(self, path: str, batch_size: int, max_len: int,
                 want_names: bool = False):
        import ctypes
        self._lib = _native_lib()
        assert self._lib is not None
        self._h = self._lib.fastq_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")
        self.batch_size = batch_size
        self.max_len = max_len
        self.want_names = want_names
        self._ct = ctypes

    def next_batch(self):
        """Returns (codes (R, L) uint8, lens (R,) int32, names | None) or
        None at EOF. Rows beyond the returned count are padding."""
        ct = self._ct
        codes = np.empty((self.batch_size, self.max_len), dtype=np.uint8)
        lens = np.zeros(self.batch_size, dtype=np.int32)
        names_cap = self.batch_size * 256 if self.want_names else 0
        names_buf = (ct.create_string_buffer(names_cap)
                     if self.want_names else None)
        n = self._lib.fastq_next_batch(
            ct.c_void_p(self._h), ct.c_int64(self.batch_size),
            ct.c_int64(self.max_len),
            codes.ctypes.data_as(ct.c_void_p),
            lens.ctypes.data_as(ct.c_void_p),
            names_buf, ct.c_int64(names_cap))
        if n < 0:
            raise IOError("malformed FASTQ/FASTA input")
        if n == 0:
            return None
        names = None
        if self.want_names:
            names = names_buf.raw.split(b"\0")[:n]
        lens_clamped = np.minimum(lens, self.max_len)
        full_lens = np.zeros(self.batch_size, dtype=np.int32)
        full_lens[:n] = lens_clamped[:n]
        return codes, full_lens, names, int(n)

    def close(self):
        if self._h:
            self._lib.fastq_close(self._ct.c_void_p(self._h))
            self._h = None


def bucket_len(n: int, cap: int) -> int:
    """Smallest bucketed length >= n (capped); keeps jit shape count low."""
    for b in LEN_BUCKETS:
        if b >= min(n, cap):
            return min(b, cap)
    return cap


def pack_seqs(seqs: Sequence[bytes], batch_size: int, max_len: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """Pack a list of byte sequences into a padded (R, L) code array."""
    n = len(seqs)
    lens = np.fromiter((min(len(s), max_len) for s in seqs), dtype=np.int32,
                       count=n)
    out = np.full((batch_size, max_len), 4, dtype=np.uint8)
    if n:
        flat = encode_seq(b"".join(s[:max_len] for s in seqs))
        mask = np.arange(max_len, dtype=np.int32)[None, :] < lens[:, None]
        full_mask = np.zeros((batch_size, max_len), dtype=bool)
        full_mask[:n] = mask
        out[full_mask] = flat
    full_lens = np.zeros(batch_size, dtype=np.int32)
    full_lens[:n] = lens
    return out, full_lens


def iter_single_chunks(paths: Sequence[str], batch_size: int, max_len: int,
                       want_names: bool = False,
                       fixed_len: bool = False) -> Iterator[ReadChunk]:
    """Stream single-end reads as fixed-shape chunks (native C++ reader
    when available, else pure Python). `fixed_len` pins every chunk to
    the max_len bucket (multi-host batches must agree on row width
    across processes)."""
    if _native_lib() is not None:
        for path in paths:
            rdr = NativeFastqReader(path, batch_size, max_len, want_names)
            try:
                while True:
                    out = rdr.next_batch()
                    if out is None:
                        break
                    codes, lens, names, n = out
                    L = (bucket_len(max_len, max_len) if fixed_len else
                         bucket_len(int(lens.max()) if n else 1, max_len))
                    yield ReadChunk(np.ascontiguousarray(codes[:, :L]),
                                    lens, n, names)
            finally:
                rdr.close()
        return
    yield from _iter_single_chunks_py(paths, batch_size, max_len,
                                      want_names, fixed_len)


def iter_paired_chunks(paths1: Sequence[str], paths2: Sequence[str],
                       batch_size: int, max_len: int,
                       want_names: bool = False,
                       fixed_len: bool = False) -> Iterator[PairedChunk]:
    """Stream paired-end reads as fixed-shape chunk pairs (native C++
    reader when available). `fixed_len` as in iter_single_chunks."""
    if len(paths1) != len(paths2):
        raise ValueError("paired-end file lists must have equal length")
    if _native_lib() is not None:
        for p1, p2 in zip(paths1, paths2):
            r1 = NativeFastqReader(p1, batch_size, max_len, want_names)
            r2 = NativeFastqReader(p2, batch_size, max_len, False)
            try:
                while True:
                    o1 = r1.next_batch()
                    o2 = r2.next_batch()
                    if o1 is None or o2 is None:
                        if (o1 is None) != (o2 is None):
                            raise IOError(
                                f"paired files {p1}/{p2} differ in length")
                        break
                    c1, l1, names, n1 = o1
                    c2, l2, _, n2 = o2
                    if n1 != n2:
                        raise IOError(
                            f"paired files {p1}/{p2} differ in length")
                    L = (bucket_len(max_len, max_len) if fixed_len else
                         bucket_len(max(int(l1.max()), int(l2.max())),
                                    max_len))
                    yield PairedChunk(
                        ReadChunk(np.ascontiguousarray(c1[:, :L]), l1, n1,
                                  names),
                        ReadChunk(np.ascontiguousarray(c2[:, :L]), l2,
                                  n2))
            finally:
                r1.close()
                r2.close()
        return
    yield from _iter_paired_chunks_py(paths1, paths2, batch_size, max_len,
                                      want_names, fixed_len)


def _iter_single_chunks_py(paths: Sequence[str], batch_size: int,
                           max_len: int,
                           want_names: bool = False,
                           fixed_len: bool = False) -> Iterator[ReadChunk]:
    """Stream single-end reads as fixed-shape chunks."""
    seqs: list[bytes] = []
    names: list[bytes] = []

    def width(ls):
        return (bucket_len(max_len, max_len) if fixed_len
                else bucket_len(max(len(x) for x in ls), max_len))

    for path in paths:
        for rec in _iter_fastq_seqs(path, want_names=want_names):
            if want_names:
                nm, s = rec
                names.append(nm)
            else:
                s = rec
            seqs.append(s)
            if len(seqs) == batch_size:
                codes, lens = pack_seqs(seqs, batch_size, width(seqs))
                yield ReadChunk(codes, lens, batch_size,
                                names if want_names else None)
                seqs, names = [], []
    if seqs:
        codes, lens = pack_seqs(seqs, batch_size, width(seqs))
        yield ReadChunk(codes, lens, len(seqs), names if want_names else None)


def _iter_paired_chunks_py(paths1: Sequence[str], paths2: Sequence[str],
                           batch_size: int, max_len: int,
                           want_names: bool = False,
                           fixed_len: bool = False
                           ) -> Iterator[PairedChunk]:
    """Stream paired-end reads as fixed-shape chunk pairs."""
    if len(paths1) != len(paths2):
        raise ValueError("paired-end file lists must have equal length")
    s1: list[bytes] = []
    s2: list[bytes] = []
    names: list[bytes] = []

    def width():
        return (bucket_len(max_len, max_len) if fixed_len
                else bucket_len(max(max(len(x) for x in s1),
                                    max(len(x) for x in s2)), max_len))

    for p1, p2 in zip(paths1, paths2):
        it1 = _iter_fastq_seqs(p1, want_names=want_names)
        it2 = _iter_fastq_seqs(p2)
        for rec, b in zip(it1, it2):
            if want_names:
                nm, a = rec
                names.append(nm)
            else:
                a = rec
            s1.append(a)
            s2.append(b)
            if len(s1) == batch_size:
                L = width()
                c1, l1 = pack_seqs(s1, batch_size, L)
                c2, l2 = pack_seqs(s2, batch_size, L)
                yield PairedChunk(
                    ReadChunk(c1, l1, batch_size,
                              names if want_names else None),
                    ReadChunk(c2, l2, batch_size))
                s1, s2, names = [], [], []
    if s1:
        L = width()
        c1, l1 = pack_seqs(s1, batch_size, L)
        c2, l2 = pack_seqs(s2, batch_size, L)
        yield PairedChunk(
            ReadChunk(c1, l1, len(s1), names if want_names else None),
            ReadChunk(c2, l2, len(s1)))
