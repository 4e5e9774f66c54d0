"""Clustering / classification metrics (first-party numpy).

Replicates the metric definitions of the reference
(``/root/reference/tools/evaluation.py``):

- ``purity``: majority-vote cluster->label mapping, then accuracy
  (reference ``calculate_purity`` :130-151) — implemented with a vectorized
  contingency build instead of the reference's O(N) Python fill loop.
- ``nmi``: normalized mutual information with arithmetic-mean normalization
  (sklearn's default, which the reference calls at :48).
- ``classification_metrics``: accuracy + macro precision/recall/F1 with
  zero-division -> NaN-skip semantics matching
  ``precision_recall_fscore_support(average='macro', zero_division=np.nan)``
  (reference :124).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def contingency(y_true: np.ndarray, y_pred: np.ndarray) -> np.ndarray:
    """[n_clusters, n_labels] count matrix over the observed id ranges."""
    y_true = np.asarray(y_true).astype(np.int64).reshape(-1)
    y_pred = np.asarray(y_pred).astype(np.int64).reshape(-1)
    d = int(max(y_pred.max(), y_true.max())) + 1
    w = np.zeros((d, d), dtype=np.int64)
    np.add.at(w, (y_pred, y_true), 1)
    return w


def purity(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Majority-vote purity: each cluster adopts its most common true label;
    score = fraction of points whose adopted label matches their true one."""
    y_true = np.asarray(y_true).astype(np.int64).reshape(-1)
    y_pred = np.asarray(y_pred).astype(np.int64).reshape(-1)
    assert y_true.size == y_pred.size
    w = contingency(y_true, y_pred)
    mapping = w.argmax(axis=1)
    return float(np.mean(mapping[y_pred] == y_true))


def _entropy(counts: np.ndarray) -> float:
    p = counts[counts > 0].astype(np.float64)
    p = p / p.sum()
    return float(-(p * np.log(p)).sum())


def nmi(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """NMI with arithmetic normalization (sklearn default)."""
    w = contingency(y_true, y_pred).astype(np.float64)
    n = w.sum()
    if n == 0:
        return 0.0
    pi = w.sum(axis=1)  # cluster sizes
    pj = w.sum(axis=0)  # label sizes
    h_pred = _entropy(pi)
    h_true = _entropy(pj)
    nz = w > 0
    pij = w[nz] / n
    outer = (pi[:, None] * pj[None, :])[nz] / (n * n)
    mi = float((pij * np.log(pij / outer)).sum())
    denom = 0.5 * (h_pred + h_true)
    if denom <= 0:
        return 0.0 if mi == 0 else 1.0
    return float(np.clip(mi / denom, 0.0, 1.0))


def classification_metrics(y_true: np.ndarray, y_pred: np.ndarray) -> Dict[str, float]:
    """accuracy + macro precision/recall/F1; classes with zero denominators
    are skipped from the macro mean (zero_division=np.nan semantics)."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    classes = np.unique(np.concatenate([y_true, y_pred]))
    accuracy = float(np.mean(y_true == y_pred))
    precisions, recalls, f1s = [], [], []
    for c in classes:
        tp = float(np.sum((y_pred == c) & (y_true == c)))
        fp = float(np.sum((y_pred == c) & (y_true != c)))
        fn = float(np.sum((y_pred != c) & (y_true == c)))
        prec = tp / (tp + fp) if (tp + fp) > 0 else np.nan
        rec = tp / (tp + fn) if (tp + fn) > 0 else np.nan
        if np.isnan(prec) or np.isnan(rec):
            f1 = np.nan
        else:
            f1 = 2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
        precisions.append(prec)
        recalls.append(rec)
        f1s.append(f1)
    return {
        "accuracy": accuracy,
        "precision": float(np.nanmean(precisions)),
        "recall": float(np.nanmean(recalls)),
        "f1": float(np.nanmean(f1s)),
    }


def quantization_error(distances: np.ndarray) -> float:
    """Mean distance from each sample to its BMU.

    SOM quality metric referenced by the reference's stale
    ``experiments/tests/test_som.py:46-49`` (its implementation was removed
    from the repo); standard definition: E_q = mean_b min_p d(x_b, w_p).
    """
    distances = np.asarray(distances)
    return float(distances.min(axis=1).mean())


def topographic_error(
    distances: np.ndarray, map_size: Tuple[int, int], topology: str = "square"
) -> float:
    """Fraction of samples whose best and second-best matching units are not
    adjacent on the map grid (same provenance as ``quantization_error``).

    Adjacency: squared grid distance <= 2 for square (8-neighborhood, the
    SOM-toolbox convention), <= 1 + 1e-6 for hexa (6-neighborhood).
    """
    from vitsom_tpu.som.layer import grid_positions

    distances = np.asarray(distances)
    order = np.argsort(distances, axis=1)[:, :2]
    pos = grid_positions(tuple(map_size), topology)
    diff = pos[order[:, 0]] - pos[order[:, 1]]
    d2 = np.sum(diff * diff, axis=1)
    thresh = 2.0 + 1e-6 if topology == "square" else 1.0 + 1e-6
    return float(np.mean(d2 > thresh))


def aggregate_runs(per_run: Dict[str, list]) -> Dict[str, Tuple[float, float]]:
    """mean/std over the 5-run benchmark loop (reference
    ``train_vit_som.py:120-130``)."""
    out = {}
    for k, scores in per_run.items():
        if scores:
            out[k] = (float(np.mean(scores)), float(np.std(scores)))
    return out
