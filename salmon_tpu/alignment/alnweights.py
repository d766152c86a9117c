"""ctypes binding for the native alignment-mode grouping pass
(native/alnweights.cpp): per-fragment weight normalization +
equivalence-row emission in one OpenMP sweep. Falls back to None when
the library is unavailable (alignment/quant.py keeps its numpy path).

Reference role: processMiniBatch's per-fragment loop
(src/alignment/SalmonQuantifyAlignments.cpp:940-1213)."""

from __future__ import annotations

import ctypes

import numpy as np

from salmon_tpu.alignment.bamio import native_lib

_CONFIGURED = False


def _lib():
    global _CONFIGURED
    lib = native_lib()
    if lib is None or not hasattr(lib, "aln_group_eq"):
        return None
    if not _CONFIGURED:
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.aln_frag_starts.restype = ctypes.c_int64
        lib.aln_frag_starts.argtypes = [i64p, ctypes.c_int64, i64p]
        lib.aln_group_eq.restype = ctypes.c_int64
        lib.aln_group_eq.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, i32p, i64p, i64p,
            f64p, ctypes.c_double, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, i32p, f32p, f64p, i64p, f64p]
        _CONFIGURED = True
    return lib


def group_eq(fid, txp, flen, obs, logw, min_aln_prob: float,
             paired: bool, max_flen: int):
    """One native pass over fragment-grouped records.

    fid must be nondecreasing (frag ids are a cumsum over the BAM
    walk). Returns (eq_txp (F, T2) i32, eq_w (F, T2) f32, wn (n,) f64
    posteriors, best (F,) i64 subset indices or -1, fld_hist
    (max_flen+1,) f64, n_mapped) or None without the library."""
    lib = _lib()
    if lib is None:
        return None
    fid = np.ascontiguousarray(fid, np.int64)
    n = fid.shape[0]
    starts = np.empty(n + 1, np.int64)
    F = int(lib.aln_frag_starts(fid, np.int64(n), starts))
    starts = np.ascontiguousarray(starts[:F + 1])
    T2 = int(np.diff(starts).max()) if F else 1
    eq_txp = np.empty((F, T2), np.int32)
    eq_w = np.empty((F, T2), np.float32)
    wn = np.empty(n, np.float64)
    best = np.empty(F, np.int64)
    fld_hist = np.empty(max_flen + 1, np.float64)
    n_mapped = int(lib.aln_group_eq(
        starts, np.int64(F), np.int64(n),
        np.ascontiguousarray(txp, np.int32),
        np.ascontiguousarray(flen, np.int64),
        np.ascontiguousarray(obs, np.int64),
        np.ascontiguousarray(logw, np.float64),
        float(min_aln_prob), np.int64(T2),
        np.int32(1 if paired else 0), np.int64(max_flen),
        eq_txp, eq_w, wn, best, fld_hist))
    return eq_txp, eq_w, wn, best, fld_hist, n_mapped
