"""First-party UMAP (eval/umap_jax.py): algorithmic correctness checks.

No umap-learn in the image, so parity is behavioral: separable clusters must
stay separated, neighborhoods preserved, and the calibration/fit internals
must satisfy the algorithm's defining equations."""

import math

import numpy as np
import pytest

from vitsom_tpu.eval import umap_jax


def _blobs(n_per=60, d=20, k=3, seed=0, sep=6.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * sep
    x = np.concatenate(
        [centers[i] + rng.normal(size=(n_per, d)) for i in range(k)]
    ).astype(np.float32)
    y = np.repeat(np.arange(k), n_per)
    return x, y


def test_knn_exact_against_bruteforce():
    x, _ = _blobs(n_per=40)
    idx, dist = umap_jax._knn_cosine(x, k=10)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    full = 1.0 - xn @ xn.T
    np.fill_diagonal(full, np.inf)
    ref_idx = np.argsort(full, axis=1)[:, :10]
    ref_d = np.take_along_axis(full, ref_idx, axis=1)
    np.testing.assert_allclose(np.sort(dist, axis=1), np.sort(ref_d, axis=1),
                               atol=1e-5)
    # top-k sets agree (order may differ on ties)
    for r in range(len(x)):
        assert set(idx[r]) == set(ref_idx[r])


def test_smooth_knn_solves_target():
    x, _ = _blobs()
    idx, dist = umap_jax._knn_cosine(x, k=15)
    rho, sigma = umap_jax._smooth_knn_dist(dist, 15.0)
    psum = np.exp(-np.maximum(dist - rho[:, None], 0.0) / sigma[:, None]).sum(1)
    np.testing.assert_allclose(psum, math.log2(15.0), atol=1e-3)
    assert (rho >= 0).all() and (sigma > 0).all()


def test_fuzzy_set_symmetric_union_bounds():
    x, _ = _blobs()
    idx, dist = umap_jax._knn_cosine(x, k=15)
    h, t, w = umap_jax.fuzzy_simplicial_set(idx, dist)
    assert len(h) == len(t) == len(w)
    assert (w > 0).all() and (w <= 1.0 + 1e-6).all()
    # no duplicate undirected pairs
    pairs = set()
    for i, j in zip(h.tolist(), t.tolist()):
        key = (min(i, j), max(i, j))
        assert key not in pairs
        pairs.add(key)


def test_find_ab_params_default_values():
    """Defaults (spread 1.0, min_dist 0.1) must reproduce umap-learn's
    well-known fitted constants a~1.577, b~0.895."""
    a, b = umap_jax.find_ab_params(1.0, 0.1)
    assert abs(a - 1.577) < 0.05, a
    assert abs(b - 0.8951) < 0.02, b


def test_embedding_separates_blobs():
    x, y = _blobs(n_per=60, k=3, seed=1)
    emb = umap_jax.umap_embed(x, n_neighbors=10, n_epochs=150, seed=0)
    assert emb.shape == (len(x), 2)
    assert np.isfinite(emb).all()
    # centroid separation >> intra-cluster spread
    cents = np.stack([emb[y == i].mean(0) for i in range(3)])
    spread = np.mean([emb[y == i].std() for i in range(3)])
    dmin = min(
        np.linalg.norm(cents[i] - cents[j])
        for i in range(3)
        for j in range(i + 1, 3)
    )
    assert dmin > 2.0 * spread, (dmin, spread)


def test_viz_uses_first_party_umap(tmp_path):
    from vitsom_tpu.eval import viz

    x, y = _blobs(n_per=40, k=2)
    out = viz.visualize_latent_projection(
        x, y, str(tmp_path / "p.png"), method="umap"
    )
    import os

    assert os.path.exists(out)
