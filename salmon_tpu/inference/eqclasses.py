"""Equivalence-class accumulation and CSR packing.

Replaces the reference's concurrent cuckoo-hash EquivalenceClassBuilder
(include/salmon/internal/quant/EquivalenceClassBuilder.hpp:237-272) with a
sort-based design (SURVEY.md §7 hard part #3): the device emits fixed-shape
(R, T2) label/weight tensors per batch; the host dedupes rows with
np.unique(axis=0) — one vectorized call per batch — and merges batch tables
into a dict keyed by the label bytes.

Rich equivalence classes: the per-fragment aux weights are accumulated
(summed) per class and normalized by the class count at finish()
(reference TGValue::normalizeAux semantics). Range factorization
(SalmonQuantify.cpp:845-853) extends the label with per-transcript
conditional-probability bin ids; those ride along as extra int32 columns.
"""

from __future__ import annotations

import dataclasses

import numpy as np

INVALID_TXP = 0x7FFFFFFF


@dataclasses.dataclass
class PackedEqClasses:
    """CSR-packed equivalence classes ready for the jitted EM."""
    labels: np.ndarray    # (n_entries,) int32 transcript ids
    weights: np.ndarray   # (n_entries,) float64 normalized aux weights
    offsets: np.ndarray   # (n_classes + 1,) int64
    counts: np.ndarray    # (n_classes,) float64 fragment counts
    class_sizes: np.ndarray  # (n_classes,) int32

    @property
    def num_classes(self) -> int:
        return self.counts.shape[0]

    @property
    def num_fragments(self) -> float:
        return float(self.counts.sum())


class EquivalenceClassAccumulator:
    """Accumulates per-batch eq-class tensors into a global table."""

    def __init__(self):
        self._table: dict[bytes, list] = {}
        self._ncols: int | None = None

    def add_batch(self, eq_txp: np.ndarray, eq_weight: np.ndarray,
                  eq_bins: np.ndarray | None = None) -> None:
        """eq_txp: (R, T2) int32 sorted labels padded with INVALID_TXP;
        eq_weight: (R, T2) float32 aux weights; eq_bins: optional (R, T2)
        int32 range-factorization bins (part of the label)."""
        valid_rows = eq_txp[:, 0] != INVALID_TXP
        if not valid_rows.any():
            return
        txp = np.ascontiguousarray(eq_txp[valid_rows])
        w = eq_weight[valid_rows].astype(np.float64)
        if eq_bins is not None:
            key_mat = np.concatenate(
                [txp, np.ascontiguousarray(eq_bins[valid_rows])], axis=1)
        else:
            key_mat = txp
        if self._ncols is None:
            self._ncols = txp.shape[1]

        uniq, inverse = np.unique(key_mat, axis=0, return_inverse=True)
        inverse = inverse.ravel()
        n = uniq.shape[0]
        counts = np.bincount(inverse, minlength=n).astype(np.float64)
        wsum = np.zeros((n, txp.shape[1]), dtype=np.float64)
        np.add.at(wsum, inverse, w)

        T2 = txp.shape[1]
        for i in range(n):
            key = uniq[i].tobytes()
            ent = self._table.get(key)
            if ent is None:
                self._table[key] = [counts[i], wsum[i].copy(),
                                    uniq[i, :T2].copy()]
            else:
                ent[0] += counts[i]
                ent[1] += wsum[i]

    @property
    def num_classes(self) -> int:
        return len(self._table)

    def finish(self) -> PackedEqClasses:
        """Normalize aux weights by class count and pack to CSR
        (reference EquivalenceClassBuilder::finish,
        EquivalenceClassBuilder.hpp:165-181)."""
        labels_l, weights_l, counts_l, sizes_l = [], [], [], []
        for ent in self._table.values():
            count, wsum, txps = ent
            m = txps != INVALID_TXP
            lab = txps[m]
            wv = wsum[m] / count
            labels_l.append(lab)
            weights_l.append(wv)
            counts_l.append(count)
            sizes_l.append(lab.shape[0])
        if not labels_l:
            return PackedEqClasses(
                labels=np.zeros(0, np.int32), weights=np.zeros(0),
                offsets=np.zeros(1, np.int64), counts=np.zeros(0),
                class_sizes=np.zeros(0, np.int32))
        sizes = np.array(sizes_l, dtype=np.int32)
        offsets = np.zeros(sizes.shape[0] + 1, dtype=np.int64)
        offsets[1:] = np.cumsum(sizes)
        return PackedEqClasses(
            labels=np.concatenate(labels_l).astype(np.int32),
            weights=np.concatenate(weights_l),
            offsets=offsets,
            counts=np.array(counts_l, dtype=np.float64),
            class_sizes=sizes)
