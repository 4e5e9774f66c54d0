"""Visualization suite: decoded prototype grids, label heatmaps, latent
projections, and the paper's params-vs-metric figure.

TPU-native re-design of the reference viz tools
(``/root/reference/tools/evaluation.py:153-323``, ``tools/plot.py``):

- prototype decoding is ONE batched decoder call (the reference loops over
  prototypes in Python, ``tools/evaluation.py:181-183``);
- the label heatmap uses a per-cell **majority vote** (the reference's
  last-write-wins assignment, ``tools/evaluation.py:256-258``, is kept
  available behind ``mode="last"`` for strict parity);
- UMAP is optional (not in the TPU image); the latent projection falls back
  to PCA with the same plot contract.

All functions are host-side (numpy/matplotlib); device work happens in the
callers' jitted eval steps.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


# ---------------------------------------------------------------------------
# pure helpers (unit-testable without a model)
# ---------------------------------------------------------------------------


def cell_label_map(
    bmu_indices: np.ndarray,
    labels: np.ndarray,
    n_prototypes: int,
    mode: str = "majority",
) -> np.ndarray:
    """Per-prototype label assignment, [P] int (-1 = unmapped cell).

    mode="majority": most frequent label among samples mapped to the cell.
    mode="last": reference parity — the label of the LAST sample written to
    the cell wins (``tools/evaluation.py:256-258``).
    """
    bmu_indices = np.asarray(bmu_indices).reshape(-1)
    labels = np.asarray(labels).reshape(-1)
    out = np.full(n_prototypes, -1, dtype=np.int64)
    if mode == "last":
        out[bmu_indices] = labels
        return out
    if mode != "majority":
        raise ValueError(f"unknown mode {mode}")
    n_classes = int(labels.max()) + 1 if labels.size else 1
    counts = np.zeros((n_prototypes, n_classes), dtype=np.int64)
    np.add.at(counts, (bmu_indices, labels), 1)
    mapped = counts.sum(axis=1) > 0
    out[mapped] = counts[mapped].argmax(axis=1)
    return out


def prototype_grid_image(
    decoded: np.ndarray, map_size: Tuple[int, int], pad: int = 1
) -> np.ndarray:
    """[P, H, W, C] decoded prototypes -> one [rows*(H+pad), cols*(W+pad), C]
    mosaic (normalized to [0, 1] per image)."""
    rows, cols = map_size
    p, h, w, c = decoded.shape
    assert p == rows * cols, f"{p} prototypes != {rows}x{cols}"
    lo = decoded.min(axis=(1, 2, 3), keepdims=True)
    hi = decoded.max(axis=(1, 2, 3), keepdims=True)
    imgs = (decoded - lo) / np.maximum(hi - lo, 1e-8)
    canvas = np.ones((rows * (h + pad) - pad, cols * (w + pad) - pad, c), np.float32)
    for i in range(rows):
        for j in range(cols):
            canvas[i * (h + pad) : i * (h + pad) + h, j * (w + pad) : j * (w + pad) + w] = imgs[
                i * cols + j
            ]
    return canvas


# ---------------------------------------------------------------------------
# figures
# ---------------------------------------------------------------------------


def visualize_decoded_prototypes(
    model,
    params,
    cfg,
    out_path: str,
    epoch: Optional[int] = None,
) -> str:
    """Decode every SOM prototype through the ViT decoder and save the
    map_size grid PNG (reference ``visualize_decoded_prototypes``,
    ``tools/evaluation.py:153-207`` — valid only for vit_som with
    ``use_reduced=False``, as there)."""
    import jax

    if cfg.model_arch != "vit_som" or cfg.som.use_reduced:
        raise ValueError(
            "prototype decoding requires vit_som with use_reduced=False "
            "(prototypes must be full patch-token latents)"
        )
    decoded = jax.jit(
        lambda p: model.apply({"params": p}, p["prototypes"], method="decode_prototypes")
    )(params)
    canvas = prototype_grid_image(np.asarray(decoded), tuple(cfg.som.map_size))

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(cfg.som.map_size[1] * 0.4, cfg.som.map_size[0] * 0.4))
    ax.imshow(canvas.squeeze(-1) if canvas.shape[-1] == 1 else canvas, cmap="gray")
    ax.set_axis_off()
    title = "decoded prototypes" + (f" (epoch {epoch})" if epoch is not None else "")
    ax.set_title(title, fontsize=8)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def visualize_label_heatmap(
    bmu_indices: np.ndarray,
    labels: np.ndarray,
    map_size: Tuple[int, int],
    out_path: str,
    mode: str = "majority",
) -> str:
    """Map each SOM cell to a class label and render the map_size heatmap
    (reference ``visualize_label_heatmap``, ``tools/evaluation.py:224-265``,
    with the last-write-wins bug replaced by majority vote by default)."""
    rows, cols = map_size
    cell_labels = cell_label_map(bmu_indices, labels, rows * cols, mode=mode)
    grid = cell_labels.reshape(rows, cols).astype(float)
    grid[grid < 0] = np.nan

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(max(4, cols * 0.3), max(4, rows * 0.3)))
    im = ax.imshow(grid, cmap="tab20", interpolation="nearest")
    n_classes = int(np.nanmax(grid)) + 1 if np.isfinite(grid).any() else 0
    if rows * cols <= 1024:  # annotate small maps like the reference
        for i in range(rows):
            for j in range(cols):
                if np.isfinite(grid[i, j]):
                    ax.text(j, i, int(grid[i, j]), ha="center", va="center", fontsize=5)
    ax.set_title(f"SOM label heatmap ({mode}, {n_classes} classes)", fontsize=9)
    ax.set_axis_off()
    fig.colorbar(im, ax=ax, fraction=0.046)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def visualize_latent_projection(
    latents: np.ndarray,
    labels: np.ndarray,
    out_path: str,
    method: str = "auto",
    seed: int = 0,
) -> str:
    """2-D projection scatter of latents colored by label (reference
    ``visualize_umap_progression``, ``tools/evaluation.py:267-323``: UMAP,
    cosine metric, n_neighbors=15). UMAP is FIRST-PARTY
    (``eval/umap_jax.py`` — kNN on the MXU, jitted SGD layout); 'auto' falls
    back to PCA only for inputs too small for the neighbor graph."""
    latents = np.asarray(latents, np.float32).reshape(len(latents), -1)
    labels = np.asarray(labels).reshape(-1)

    if method not in ("auto", "umap", "pca"):
        raise ValueError(f"unknown projection method {method!r}")
    used = method
    if method in ("auto", "umap"):
        try:
            from vitsom_tpu.eval.umap_jax import umap_embed

            emb = umap_embed(latents, n_neighbors=15, seed=seed)
            used = "umap"
        except ValueError:  # too few points for the neighbor graph
            if method == "umap":
                raise
            used = "pca"
    if used in ("pca", "auto"):
        from sklearn.decomposition import PCA

        emb = PCA(n_components=2, random_state=seed).fit_transform(latents)
        used = "pca"

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 6))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, s=2, cmap="tab10", alpha=0.6)
    ax.set_title(f"latent projection ({used})", fontsize=9)
    fig.colorbar(sc, ax=ax, fraction=0.046)
    fig.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_params_vs_metric(
    names: Sequence[str],
    n_params_m: Sequence[float],
    purity: Sequence[Optional[float]],
    accuracy: Sequence[Optional[float]],
    out_path: str,
) -> str:
    """The paper's dual-axis params-vs-purity/accuracy scatter
    (reference ``tools/plot.py``) from caller-supplied numbers instead of
    hard-coded table values."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig, ax1 = plt.subplots(figsize=(5, 3.2))
    ax2 = ax1.twinx()
    for name, p, pur, acc in zip(names, n_params_m, purity, accuracy):
        if pur is not None:
            ax1.scatter(p, pur, marker="o", label=f"{name} (purity)")
            ax1.annotate(name, (p, pur), fontsize=6)
        if acc is not None:
            ax2.scatter(p, acc, marker="^")
            ax2.annotate(name, (p, acc), fontsize=6)
    ax1.set_xlabel("parameters (M)")
    ax1.set_ylabel("purity")
    ax2.set_ylabel("accuracy")
    ax1.set_xscale("log")
    fig.tight_layout()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path
