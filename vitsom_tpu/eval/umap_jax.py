"""First-party UMAP for the latent-progression figures.

The reference projects latents with umap-learn (cosine metric,
n_neighbors=15, ``/root/reference/tools/evaluation.py:267-323``); that
package isn't in the TPU image, and round 1 silently fell back to PCA. This
module implements the UMAP algorithm itself (McInnes, Healy & Melville 2018)
TPU-first instead of vendoring:

- exact kNN by blocked cosine similarity on device — an [N, D] x [D, N]
  matmul chunked over rows, top-k per chunk (the MXU eats the N^2 D work
  that umap-learn's NN-descent exists to avoid on CPUs);
- smooth-kNN calibration (rho/sigma binary search) and fuzzy simplicial
  union, vectorized numpy;
- layout by the standard attract/repel SGD with the (a, b) curve fitted
  from (min_dist, spread), as one jitted ``lax.fori_loop``: per epoch every
  edge fires with probability proportional to its membership weight
  (vectorized Bernoulli) and scatter-adds its updates, with 5 random
  negatives per fired edge. This batched variant replaces umap-learn's
  sequential per-edge loop — update ORDER differs within an epoch (a
  documented deviation; the objective and annealing schedule are the same),
  which is what makes the whole layout a single compiled device program.

Deterministic per seed. Output matches umap-learn qualitatively (cluster
separation / neighborhood preservation, asserted in tests/test_umap.py),
not numerically — no two UMAP runs match numerically anyway.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SMOOTH_K_TOLERANCE = 1e-5
MIN_K_DIST_SCALE = 1e-3


# ---------------------------------------------------------------------------
# kNN (cosine) — blocked matmul
# ---------------------------------------------------------------------------


def _knn_cosine(x: np.ndarray, k: int, block: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-nearest-neighbors under cosine distance. Returns
    (indices [N, k], distances [N, k]), self excluded."""
    n = x.shape[0]
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    xd = jnp.asarray(xn)

    @jax.jit
    def chunk_topk(rows):
        sims = rows @ xd.T  # [b, N]
        d = 1.0 - sims
        neg, idx = jax.lax.top_k(-d, k + 1)  # includes self at d=0
        return idx, -neg

    idxs, dists = [], []
    for s in range(0, n, block):
        i, d = chunk_topk(xd[s : s + block])
        idxs.append(np.asarray(i))
        dists.append(np.asarray(d))
    idx = np.concatenate(idxs)
    dist = np.concatenate(dists)

    # drop self (first column almost always; mask wherever it hides)
    rows = np.arange(n)[:, None]
    self_mask = idx == rows
    # stable removal of exactly one self entry per row
    keep = np.ones_like(idx, bool)
    first_self = np.where(
        self_mask.any(axis=1), self_mask.argmax(axis=1), idx.shape[1] - 1
    )
    keep[np.arange(n), first_self] = False
    out_idx = idx[keep].reshape(n, k + 0)
    out_dist = np.maximum(dist[keep].reshape(n, k + 0), 0.0)
    return out_idx, out_dist


# ---------------------------------------------------------------------------
# fuzzy simplicial set
# ---------------------------------------------------------------------------


def _smooth_knn_dist(dists: np.ndarray, k: float, n_iter: int = 64):
    """Per-point (rho, sigma): rho = nearest nonzero distance; sigma solves
    sum_j exp(-max(d_ij - rho, 0)/sigma) = log2(k) by bisection."""
    n = dists.shape[0]
    target = math.log2(k)
    rho = np.zeros(n)
    nonzero = dists > 0.0
    has = nonzero.any(axis=1)
    first_nz = np.where(has, np.argmax(nonzero, axis=1), 0)
    rho[has] = dists[has, first_nz[has]]

    lo = np.zeros(n)
    hi = np.full(n, np.inf)
    mid = np.ones(n)
    for _ in range(n_iter):
        psum = np.exp(-np.maximum(dists - rho[:, None], 0.0) / mid[:, None]).sum(1)
        done = np.abs(psum - target) < SMOOTH_K_TOLERANCE
        if done.all():
            break
        too_big = psum > target
        hi = np.where(too_big & ~done, mid, hi)
        lo = np.where(~too_big & ~done, mid, lo)
        mid = np.where(
            too_big, (lo + mid) / 2.0, np.where(np.isinf(hi), mid * 2.0, (mid + hi) / 2.0)
        )
    mean_d = dists.mean()
    mean_row = dists.mean(axis=1)
    floor = np.where(rho > 0.0, MIN_K_DIST_SCALE * mean_row, MIN_K_DIST_SCALE * mean_d)
    return rho, np.maximum(mid, floor)


def fuzzy_simplicial_set(idx: np.ndarray, dists: np.ndarray):
    """Edge list (heads, tails, weights) of the symmetrized fuzzy union
    P + P^T - P o P^T, deduplicated."""
    n, k = idx.shape
    rho, sigma = _smooth_knn_dist(dists, float(k))
    w = np.exp(-np.maximum(dists - rho[:, None], 0.0) / sigma[:, None])
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = idx.reshape(-1).astype(np.int64)
    vals = w.reshape(-1)

    # vectorized symmetrization: for edge (i, j, p) look up q = P[j, i] by
    # binary search over the sorted flat keys (kNN emits each (i, j) once)
    fwd = rows * n + cols
    rev = cols * n + rows
    sort_idx = np.argsort(fwd)
    sorted_fwd = fwd[sort_idx]
    pos = np.searchsorted(sorted_fwd, rev)
    pos_c = np.minimum(pos, len(sorted_fwd) - 1)
    found = sorted_fwd[pos_c] == rev
    q = np.where(found, vals[sort_idx[pos_c]], 0.0)
    u = vals + q - vals * q
    # one undirected edge per pair: the (i < j) copy when both directions
    # exist (u is symmetric), else whichever direction exists
    keep = ((rows < cols) | ~found) & (u > 0.0)
    return (
        rows[keep].astype(np.int32),
        cols[keep].astype(np.int32),
        u[keep].astype(np.float32),
    )


# ---------------------------------------------------------------------------
# (a, b) curve from (min_dist, spread)
# ---------------------------------------------------------------------------


def find_ab_params(spread: float = 1.0, min_dist: float = 0.1) -> Tuple[float, float]:
    """Least-squares fit of 1/(1 + a x^{2b}) to the target membership curve
    (umap-learn's curve-fit, replicated with a small Gauss-Newton loop)."""
    xv = np.linspace(0, spread * 3, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))
    a, b = 1.0, 1.0
    for _ in range(200):
        f = 1.0 / (1.0 + a * xv ** (2 * b))
        r = yv - f
        x2b = xv ** (2 * b)
        denom = (1.0 + a * x2b) ** 2
        da = -x2b / denom
        with np.errstate(divide="ignore", invalid="ignore"):
            db = np.where(xv > 0, -2.0 * a * x2b * np.log(xv) / denom, 0.0)
        J = np.stack([da, db], 1)
        g = J.T @ r
        H = J.T @ J + 1e-6 * np.eye(2)
        step = np.linalg.solve(H, g)
        a = float(max(a + step[0], 1e-3))
        b = float(max(b + step[1], 1e-3))
        if np.abs(step).max() < 1e-9:
            break
    return a, b


# ---------------------------------------------------------------------------
# layout optimization (jitted)
# ---------------------------------------------------------------------------


def _optimize_layout(
    emb0: np.ndarray,
    heads: np.ndarray,
    tails: np.ndarray,
    weights: np.ndarray,
    n_epochs: int,
    a: float,
    b: float,
    seed: int,
    neg_samples: int = 5,
    initial_alpha: float = 1.0,
) -> np.ndarray:
    n = emb0.shape[0]
    heads_j = jnp.asarray(heads)
    tails_j = jnp.asarray(tails)
    # umap-learn schedules each edge every (max_w / w) epochs; Bernoulli
    # firing with p = w / max_w has the same expected rate
    p_fire = jnp.asarray(weights / weights.max())
    clip = 4.0

    def attract_grad(d2):
        g = (-2.0 * a * b * d2 ** (b - 1.0)) / (a * d2**b + 1.0)
        return g

    def repel_grad(d2):
        g = (2.0 * b) / ((0.001 + d2) * (a * d2**b + 1.0))
        return g

    def epoch(i, carry):
        emb, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        alpha = initial_alpha * (1.0 - i / n_epochs)
        fire = jax.random.uniform(k1, p_fire.shape) < p_fire

        he = emb[heads_j]
        te = emb[tails_j]
        diff = he - te
        d2 = jnp.maximum(jnp.sum(diff * diff, axis=1), 0.0)
        g = jnp.where(d2 > 0.0, attract_grad(d2), 0.0)
        upd = jnp.clip(g[:, None] * diff, -clip, clip)
        upd = jnp.where(fire[:, None], upd, 0.0) * alpha
        emb = emb.at[heads_j].add(upd)
        emb = emb.at[tails_j].add(-upd)

        # negatives: repel each fired head from random points
        negs = jax.random.randint(k2, (heads_j.shape[0], neg_samples), 0, n)
        he = emb[heads_j]
        ne = emb[negs]  # [E, S, 2]
        diffn = he[:, None, :] - ne
        d2n = jnp.sum(diffn * diffn, axis=2)
        gn = jnp.where(d2n > 0.0, repel_grad(d2n), 0.0)
        updn = jnp.clip(gn[..., None] * diffn, -clip, clip)
        updn = jnp.where(fire[:, None, None], updn, 0.0) * alpha
        emb = emb.at[heads_j].add(jnp.sum(updn, axis=1))
        return emb, key

    emb, _ = jax.lax.fori_loop(
        0, n_epochs, epoch, (jnp.asarray(emb0, jnp.float32), jax.random.key(seed))
    )
    return np.asarray(emb)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def umap_embed(
    x: np.ndarray,
    n_neighbors: int = 15,
    n_components: int = 2,
    min_dist: float = 0.1,
    spread: float = 1.0,
    n_epochs: Optional[int] = None,
    seed: int = 0,
) -> np.ndarray:
    """UMAP embedding (cosine metric), matching the reference's call
    ``umap.UMAP(n_neighbors=15, metric='cosine')`` in spirit and defaults."""
    x = np.asarray(x, np.float32).reshape(len(x), -1)
    n = x.shape[0]
    if n <= n_neighbors + 1:
        raise ValueError(f"need more than n_neighbors+1={n_neighbors + 1} points")
    idx, dists = _knn_cosine(x, n_neighbors)
    heads, tails, weights = fuzzy_simplicial_set(idx, dists)

    if n_epochs is None:
        n_epochs = 500 if n < 10_000 else 200
    # umap-learn prunes edges that would fire less than once
    keep = weights >= weights.max() / float(n_epochs)
    heads, tails, weights = heads[keep], tails[keep], weights[keep]

    # PCA init scaled to 10 (umap-learn's spectral init stand-in; PCA init
    # is umap-learn's documented `init='pca'` alternative and is deterministic)
    xc = x - x.mean(0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    emb0 = xc @ vt[:n_components].T
    emb0 = emb0 / max(np.abs(emb0).max(), 1e-12) * 10.0
    emb0 = emb0 + np.random.default_rng(seed).normal(0, 1e-4, emb0.shape)

    a, b = find_ab_params(spread, min_dist)
    return _optimize_layout(
        emb0.astype(np.float32), heads, tails, weights, int(n_epochs), a, b, seed
    )
