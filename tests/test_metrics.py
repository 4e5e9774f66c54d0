"""Metric parity tests against sklearn (the reference's metric backends)."""

import numpy as np
import pytest

from vitsom_tpu.eval import metrics


def _ref_purity(y_true, y_pred):
    """Oracle replicating reference calculate_purity semantics
    (``tools/evaluation.py:130-151``): majority-vote mapping then accuracy."""
    d = max(y_pred.max(), y_true.max()) + 1
    w = np.zeros((d, d), dtype=np.int64)
    for p, t in zip(y_pred, y_true):
        w[p, t] += 1
    mapping = w.argmax(axis=1)
    return float(np.mean(mapping[y_pred] == y_true))


def test_purity_matches_reference_oracle():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 10, size=5000)
    y_pred = rng.integers(0, 64, size=5000)
    assert np.isclose(metrics.purity(y_true, y_pred), _ref_purity(y_true, y_pred))


def test_purity_perfect_and_degenerate():
    y = np.array([0, 1, 2, 0, 1, 2])
    assert metrics.purity(y, np.array([5, 9, 3, 5, 9, 3])) == 1.0
    # everything in one cluster -> purity = max class frequency
    assert np.isclose(metrics.purity(y, np.zeros(6, int)), 2 / 6)


def test_nmi_matches_sklearn():
    from sklearn.metrics import normalized_mutual_info_score

    rng = np.random.default_rng(1)
    for _ in range(5):
        y_true = rng.integers(0, 10, size=2000)
        y_pred = (y_true + rng.integers(0, 3, size=2000)) % 12  # correlated
        assert np.isclose(
            metrics.nmi(y_true, y_pred),
            normalized_mutual_info_score(y_true, y_pred),
            atol=1e-10,
        )


def test_classification_metrics_match_sklearn():
    from sklearn.metrics import accuracy_score, precision_recall_fscore_support

    rng = np.random.default_rng(2)
    y_true = rng.integers(0, 10, size=3000)
    y_pred = np.where(rng.random(3000) < 0.7, y_true, rng.integers(0, 10, size=3000))
    m = metrics.classification_metrics(y_true, y_pred)
    assert np.isclose(m["accuracy"], accuracy_score(y_true, y_pred))
    p, r, f1, _ = precision_recall_fscore_support(
        y_true, y_pred, average="macro", zero_division=np.nan
    )
    assert np.isclose(m["precision"], p)
    assert np.isclose(m["recall"], r)
    assert np.isclose(m["f1"], f1)


def test_classification_metrics_zero_division_skip():
    from sklearn.metrics import precision_recall_fscore_support

    # class 3 never predicted -> nan precision skipped from macro mean
    y_true = np.array([0, 1, 2, 3, 0, 1])
    y_pred = np.array([0, 1, 2, 2, 0, 1])
    m = metrics.classification_metrics(y_true, y_pred)
    p, r, f1, _ = precision_recall_fscore_support(
        y_true, y_pred, average="macro", zero_division=np.nan
    )
    assert np.isclose(m["precision"], p)
    assert np.isclose(m["recall"], r)


def test_aggregate_runs():
    agg = metrics.aggregate_runs({"purity": [0.9, 0.92, 0.94], "empty": []})
    mean, std = agg["purity"]
    assert np.isclose(mean, 0.92)
    assert "empty" not in agg
