"""Visualization tests: pure helpers + figure files render end-to-end."""

import os

import jax
import numpy as np
import pytest

from vitsom_tpu.eval import viz


def test_cell_label_map_majority():
    # cell 0: labels [1, 1, 2] -> 1 ; cell 2: [5] -> 5 ; cell 1: unmapped
    bmu = np.array([0, 0, 0, 2])
    labels = np.array([1, 2, 1, 5])
    out = viz.cell_label_map(bmu, labels, n_prototypes=3, mode="majority")
    assert out.tolist() == [1, -1, 5]


def test_cell_label_map_last_parity():
    # reference last-write-wins (tools/evaluation.py:256-258)
    bmu = np.array([0, 0])
    labels = np.array([1, 7])
    out = viz.cell_label_map(bmu, labels, n_prototypes=2, mode="last")
    assert out.tolist() == [7, -1]


def test_prototype_grid_image_shape():
    decoded = np.random.rand(6, 8, 8, 1).astype(np.float32)
    canvas = viz.prototype_grid_image(decoded, (2, 3), pad=1)
    assert canvas.shape == (2 * 9 - 1, 3 * 9 - 1, 1)
    assert canvas.min() >= 0.0 and canvas.max() <= 1.0


def test_label_heatmap_file(tmp_path):
    bmu = np.random.randint(0, 16, size=200)
    labels = np.random.randint(0, 10, size=200)
    p = viz.visualize_label_heatmap(bmu, labels, (4, 4), str(tmp_path / "hm.png"))
    assert os.path.getsize(p) > 0


def test_latent_projection_pca_fallback(tmp_path):
    latents = np.random.rand(100, 32).astype(np.float32)
    labels = np.random.randint(0, 10, size=100)
    p = viz.visualize_latent_projection(latents, labels, str(tmp_path / "proj.png"))
    assert os.path.getsize(p) > 0


def test_params_vs_metric_plot(tmp_path):
    p = viz.plot_params_vs_metric(
        names=["vit_som", "desom"],
        n_params_m=[2.2, 0.5],
        purity=[0.95, 0.93],
        accuracy=[None, None],
        out_path=str(tmp_path / "fig.pdf"),
    )
    assert os.path.getsize(p) > 0


def test_decoded_prototypes_figure(tmp_path):
    from vitsom_tpu.config import Config, DataConfig, SOMConfig, ViTConfig
    from vitsom_tpu.models.vit_som import ViTSOM
    import jax.numpy as jnp

    cfg = Config(
        model_arch="vit_som",
        som=SOMConfig(map_size=(2, 2), distance_fcn="cosine"),
        vit=ViTConfig(patch_size=7, emb_dim=8, depth=1, heads=1, dec_emb_dim=8, dec_depth=1),
        data=DataConfig(dataset="mnist", num_classes=0, num_channels=1, input_size=28),
    ).validate()
    model = ViTSOM(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 1)))["params"]
    p = viz.visualize_decoded_prototypes(model, params, cfg, str(tmp_path / "protos.png"))
    assert os.path.getsize(p) > 0


def test_decoded_prototypes_rejects_reduced():
    from vitsom_tpu.config import Config, DataConfig, SOMConfig, ViTConfig

    cfg = Config(
        model_arch="vit_som",
        som=SOMConfig(map_size=(2, 2), use_reduced=True, distance_fcn="cosine"),
        vit=ViTConfig(patch_size=7, emb_dim=8, depth=1, heads=1, dec_emb_dim=8, dec_depth=1),
        data=DataConfig(dataset="mnist", num_classes=0, num_channels=1, input_size=28),
    ).validate()
    with pytest.raises(ValueError):
        viz.visualize_decoded_prototypes(None, None, cfg, "/tmp/never.png")
