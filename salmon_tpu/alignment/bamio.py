"""BAM input: ctypes bindings over the native reader (native/bamreader.cpp)
with a pure-Python BGZF fallback.

Reference analog: htslib + the BAMQueue producer thread
(include/salmon/internal/alignment/BAMQueue.hpp/.tpp, src/io/
AlignmentIO.cpp). Records are streamed as flat numpy arrays and grouped
into fragments by read-name hash adjacency (the reference likewise
requires all records of a read to be contiguous).
"""

from __future__ import annotations

import ctypes
import dataclasses
import gzip
import os
import struct
import zlib

import numpy as np

# BAM flags
FLAG_PAIRED = 0x1
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_READ1 = 0x40
FLAG_READ2 = 0x80
FLAG_SECONDARY = 0x100

CIGAR_OPS = "MIDNSHP=X"


@dataclasses.dataclass
class BamBatch:
    """One flat batch of records + the shared seq/cigar pools."""
    refid: np.ndarray
    pos: np.ndarray
    flag: np.ndarray
    mapq: np.ndarray
    mate_refid: np.ndarray
    mate_pos: np.ndarray
    tlen: np.ndarray
    read_len: np.ndarray
    seq_off: np.ndarray
    cigar_off: np.ndarray
    cigar_n: np.ndarray
    as_tag: np.ndarray
    nm_tag: np.ndarray
    # ZW:f posterior weight (NaN when absent; written by --sampleOut)
    zw_tag: np.ndarray
    name_hash: np.ndarray
    seq_buf: np.ndarray
    cigar_op: np.ndarray
    cigar_oplen: np.ndarray
    n: int
    names: list = None


def _load_native():
    so = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libsalmontpu.so")
    if not os.path.exists(so):
        try:
            import sys
            sys.path.insert(0, os.path.dirname(os.path.dirname(so)))
            from native.build import build
            so = build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.bam_open.restype = ctypes.c_void_p
    lib.bam_open.argtypes = [ctypes.c_char_p]
    lib.bam_close.argtypes = [ctypes.c_void_p]
    lib.bam_n_refs.restype = ctypes.c_int32
    lib.bam_n_refs.argtypes = [ctypes.c_void_p]
    lib.bam_ref_name.restype = ctypes.c_char_p
    lib.bam_ref_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.bam_ref_len.restype = ctypes.c_int32
    lib.bam_ref_len.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.bam_text_header.restype = ctypes.c_char_p
    lib.bam_text_header.argtypes = [ctypes.c_void_p]
    lib.bam_next_batch.restype = ctypes.c_int64
    return lib


_NATIVE = None
_NATIVE_TRIED = False


def native_lib():
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE = _load_native()
        _NATIVE_TRIED = True
    return _NATIVE


class BamReader:
    """Streaming BAM reader (native if available, else pure Python)."""

    def __init__(self, path: str, batch_records: int = 65536,
                 want_names: bool = False):
        self.path = path
        self.batch_records = batch_records
        self.want_names = want_names
        self._lib = native_lib()
        if self._lib is not None:
            self._h = self._lib.bam_open(path.encode())
            if not self._h:
                raise IOError(f"failed to open BAM {path}")
            n = self._lib.bam_n_refs(self._h)
            self.ref_names = [self._lib.bam_ref_name(self._h, i).decode()
                              for i in range(n)]
            self.ref_lens = np.array(
                [self._lib.bam_ref_len(self._h, i) for i in range(n)],
                dtype=np.int32)
            self.header_text = self._lib.bam_text_header(
                self._h).decode(errors="replace")
        else:
            self._py = _PyBam(path)
            self.ref_names = self._py.ref_names
            self.ref_lens = np.array(self._py.ref_lens, dtype=np.int32)
            self.header_text = self._py.header_text

    def close(self):
        if self._lib is not None and self._h:
            self._lib.bam_close(self._h)
            self._h = None

    def batches(self) -> Iterator[BamBatch]:
        if self._lib is not None:
            yield from self._native_batches()
        else:
            yield from self._py.batches(self.batch_records,
                                        self.want_names)

    def _native_batches(self):
        cap = self.batch_records
        seq_cap = cap * 512
        cigar_cap = cap * 16
        I32 = lambda n: np.zeros(n, dtype=np.int32)
        while True:
            b = BamBatch(
                refid=I32(cap), pos=I32(cap),
                flag=np.zeros(cap, np.uint16), mapq=np.zeros(cap, np.uint8),
                mate_refid=I32(cap), mate_pos=I32(cap), tlen=I32(cap),
                read_len=I32(cap), seq_off=np.zeros(cap, np.int64),
                cigar_off=np.zeros(cap, np.int64), cigar_n=I32(cap),
                as_tag=I32(cap), nm_tag=I32(cap),
                zw_tag=np.zeros(cap, np.float32),
                name_hash=np.zeros(cap, np.uint64),
                seq_buf=np.zeros(seq_cap, np.uint8),
                cigar_op=np.zeros(cigar_cap, np.uint8),
                cigar_oplen=np.zeros(cigar_cap, np.uint32), n=0)
            names_cap = cap * 256 if self.want_names else 0
            names_buf = (ctypes.create_string_buffer(names_cap)
                         if self.want_names else None)
            ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
            n = self._lib.bam_next_batch(
                ctypes.c_void_p(self._h), ctypes.c_int64(cap),
                ctypes.c_int64(seq_cap), ctypes.c_int64(cigar_cap),
                ptr(b.refid), ptr(b.pos), ptr(b.flag), ptr(b.mapq),
                ptr(b.mate_refid), ptr(b.mate_pos), ptr(b.tlen),
                ptr(b.read_len), ptr(b.seq_off), ptr(b.cigar_off),
                ptr(b.cigar_n), ptr(b.as_tag), ptr(b.nm_tag),
                ptr(b.zw_tag),
                ptr(b.name_hash), ptr(b.seq_buf), ptr(b.cigar_op),
                ptr(b.cigar_oplen), names_buf,
                ctypes.c_int64(names_cap))
            if n <= 0:
                if n < 0:
                    raise IOError("BAM record larger than batch buffers")
                return
            b.n = int(n)
            if self.want_names:
                b.names = names_buf.raw.split(b"\0")[:b.n]
            yield b


# ---------------------------------------------------------------------------
# Pure-Python fallback (also used to validate the native reader in tests)

_SEQ4 = np.full(16, 4, dtype=np.uint8)
for _i, _b in [(1, 0), (2, 1), (4, 2), (8, 3)]:
    _SEQ4[_i] = _b


class _PyBam:
    def __init__(self, path: str):
        self._fh = gzip.open(path, "rb")  # gzip handles BGZF members
        magic = self._fh.read(4)
        if magic != b"BAM\x01":
            raise IOError(f"{path}: not a BAM file")
        (l_text,) = struct.unpack("<i", self._fh.read(4))
        self.header_text = self._fh.read(l_text).rstrip(
            b"\x00").decode(errors="replace")
        (n_ref,) = struct.unpack("<i", self._fh.read(4))
        self.ref_names, self.ref_lens = [], []
        for _ in range(n_ref):
            (ln,) = struct.unpack("<i", self._fh.read(4))
            nm = self._fh.read(ln)[:-1].decode()
            (lr,) = struct.unpack("<i", self._fh.read(4))
            self.ref_names.append(nm)
            self.ref_lens.append(lr)

    def _records(self):
        """Yield (row_tuple, hash, rname, seq, cigar) per BAM record."""
        while True:
            hdr = self._fh.read(4)
            if len(hdr) < 4:
                return
            (bs,) = struct.unpack("<i", hdr)
            rec = self._fh.read(bs)
            (refid, pos, lrn, mapq, _bin, ncig, flag, lseq, nrefid,
             npos, tlen) = struct.unpack("<iiBBHHHiiii", rec[:32])
            rname = rec[32:32 + lrn - 1]
            cig_at = 32 + lrn
            seq_at = cig_at + ncig * 4
            qual_at = seq_at + (lseq + 1) // 2
            tags_at = qual_at + lseq
            cig = np.frombuffer(rec[cig_at:seq_at], dtype=np.uint32)
            s4 = np.frombuffer(rec[seq_at:qual_at], dtype=np.uint8)
            hi = _SEQ4[s4 >> 4]
            lo = _SEQ4[s4 & 0xF]
            seq = np.empty(hi.size * 2, dtype=np.uint8)
            seq[0::2] = hi
            seq[1::2] = lo
            seq = seq[:lseq]
            as_v, nm_v, zw_v = self._tags(rec[tags_at:])
            h = 1469598103934665603
            for ch in rname:
                h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            yield ((refid, pos, flag, mapq, nrefid, npos, tlen,
                    lseq, as_v, nm_v), h, bytes(rname), seq, cig, zw_v)

    def batches(self, cap: int,
                want_names: bool = False) -> Iterator[BamBatch]:
        it = self._records()
        carry = []  # deferred records (a name group moved whole)
        eof = False
        while not eof:
            items = carry
            carry = []
            while len(items) < cap:
                nxt = next(it, None)
                if nxt is None:
                    eof = True
                    break
                items.append(nxt)
            if not eof and len(items) == cap:
                # never split a read-name group across batches (the
                # reference BAMQueue keeps a read's records together)
                nxt = next(it, None)
                if nxt is None:
                    eof = True
                elif nxt[1] == items[-1][1]:
                    gh = items[-1][1]
                    gstart = len(items)
                    while gstart > 0 and items[gstart - 1][1] == gh:
                        gstart -= 1
                    if gstart > 0:
                        carry = items[gstart:] + [nxt]
                        items = items[:gstart]
                    else:  # whole batch is one group: split anyway
                        carry = [nxt]
                else:
                    carry = [nxt]
            if not items:
                return
            rows = [x[0] for x in items]
            hashes = [x[1] for x in items]
            names = [x[2] for x in items] if want_names else []
            seqs = [x[3] for x in items]
            cigars = [x[4] for x in items]
            zws = np.array([x[5] for x in items], np.float32)
            n = len(rows)
            arr = np.array(rows, dtype=np.int64)
            seq_off = np.zeros(n, np.int64)
            off = 0
            for i, s in enumerate(seqs):
                seq_off[i] = off
                off += s.size
            cigar_off = np.zeros(n, np.int64)
            coff = 0
            for i, c in enumerate(cigars):
                cigar_off[i] = coff
                coff += c.size
            cig_all = (np.concatenate(cigars) if cigars
                       else np.zeros(0, np.uint32))
            yield BamBatch(
                refid=arr[:, 0].astype(np.int32),
                pos=arr[:, 1].astype(np.int32),
                flag=arr[:, 2].astype(np.uint16),
                mapq=arr[:, 3].astype(np.uint8),
                mate_refid=arr[:, 4].astype(np.int32),
                mate_pos=arr[:, 5].astype(np.int32),
                tlen=arr[:, 6].astype(np.int32),
                read_len=arr[:, 7].astype(np.int32),
                seq_off=seq_off,
                cigar_off=cigar_off,
                cigar_n=np.array([c.size for c in cigars], np.int32),
                as_tag=arr[:, 8].astype(np.int32),
                nm_tag=arr[:, 9].astype(np.int32),
                zw_tag=zws,
                name_hash=np.array(hashes, dtype=np.uint64),
                names=names if want_names else None,
                seq_buf=(np.concatenate(seqs) if seqs
                         else np.zeros(0, np.uint8)),
                cigar_op=(cig_all & 0xF).astype(np.uint8),
                cigar_oplen=(cig_all >> 4).astype(np.uint32),
                n=n)

    @staticmethod
    def _tags(buf: bytes):
        as_v, nm_v = np.iinfo(np.int32).min, np.iinfo(np.int32).min
        zw_v = float("nan")
        t = 0
        sizes = {"A": 1, "c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4,
                 "f": 4}
        fmts = {"c": "<b", "C": "<B", "s": "<h", "S": "<H", "i": "<i",
                "I": "<I"}
        while t + 3 <= len(buf):
            t1, t2, ty = chr(buf[t]), chr(buf[t + 1]), chr(buf[t + 2])
            t += 3
            if ty in ("Z", "H"):
                end = buf.index(b"\0", t)
                t = end + 1
                continue
            if ty == "B":
                el = chr(buf[t])
                (cnt,) = struct.unpack("<i", buf[t + 1:t + 5])
                t += 5 + cnt * sizes.get(el, 4)
                continue
            sz = sizes.get(ty)
            if sz is None or t + sz > len(buf):
                break
            if ty in fmts:
                (val,) = struct.unpack(fmts[ty], buf[t:t + sz])
                if t1 == "A" and t2 == "S":
                    as_v = int(val)
                if t1 == "N" and t2 == "M":
                    nm_v = int(val)
            elif ty == "f" and t1 == "Z" and t2 == "W":
                (zw_v,) = struct.unpack("<f", buf[t:t + sz])
            t += sz
        return as_v, nm_v, zw_v


# ---------------------------------------------------------------------------
# Minimal BAM writer (tests + posterior-sampled output)

def write_bam(path: str, ref_names, ref_lens, records) -> None:
    """records: iterable of dicts with keys name, refid, pos, flag, mapq,
    seq (str), cigar (str like '76M'), mate_refid, mate_pos, tlen,
    optional tags {'AS': int, 'NM': int}."""
    import re

    body = io = bytearray()
    body += b"BAM\x01"
    text = "".join(f"@SQ\tSN:{n}\tLN:{l}\n"
                   for n, l in zip(ref_names, ref_lens)).encode()
    body += struct.pack("<i", len(text)) + text
    body += struct.pack("<i", len(ref_names))
    for n, l in zip(ref_names, ref_lens):
        nb = n.encode() + b"\0"
        body += struct.pack("<i", len(nb)) + nb + struct.pack("<i", int(l))

    code_of = {"A": 1, "C": 2, "G": 4, "T": 8, "N": 15}
    for r in records:
        name = r["name"].encode() + b"\0"
        cig_ops = []
        for m in re.finditer(r"(\d+)([MIDNSHP=X])", r.get("cigar", "")):
            cig_ops.append((int(m.group(1)) << 4)
                           | CIGAR_OPS.index(m.group(2)))
        seq = r.get("seq", "")
        s4 = bytearray()
        for i in range(0, len(seq), 2):
            hi = code_of.get(seq[i], 15) << 4
            lo = code_of.get(seq[i + 1], 15) if i + 1 < len(seq) else 0
            s4.append(hi | lo)
        qual = bytes([0xFF] * len(seq))
        tags = bytearray()
        for tag, val in (r.get("tags") or {}).items():
            tags += tag.encode() + b"i" + struct.pack("<i", int(val))
        rec = struct.pack(
            "<iiBBHHHiiii", r["refid"], r["pos"], len(name),
            r.get("mapq", 60), 0, len(cig_ops), r.get("flag", 0),
            len(seq), r.get("mate_refid", -1), r.get("mate_pos", -1),
            r.get("tlen", 0))
        rec += name
        rec += b"".join(struct.pack("<I", c) for c in cig_ops)
        rec += bytes(s4) + qual + bytes(tags)
        body += struct.pack("<i", len(rec)) + rec

    with open(path, "wb") as fh:
        data = bytes(body)
        for i in range(0, len(data), 60000):
            chunk = data[i:i + 60000]
            fh.write(_bgzf_block(chunk))
        fh.write(_bgzf_block(b""))  # EOF marker


def _bgzf_block(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = co.compress(data) + co.flush()
    bsize = len(cdata) + 25 + 1
    hdr = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
           + struct.pack("<H", 6)  # xlen
           + b"BC" + struct.pack("<H", 2) + struct.pack("<H", bsize - 1))
    tail = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data))
    return hdr + cdata + tail
