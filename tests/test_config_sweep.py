"""Every shipped config must parse, validate, and build its model."""

import glob
import os

import pytest

from vitsom_tpu.config import load_config
from vitsom_tpu.train.trainer import build_model

CONFIGS = sorted(glob.glob("configs/*/*.yaml"))


def test_all_reference_configs_present():
    # one-for-one with the reference's shipped config inventory
    assert len(CONFIGS) == 35, CONFIGS


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_parses_and_model_builds(path):
    cfg = load_config(path)
    model_dir = os.path.basename(os.path.dirname(path))
    assert cfg.model_arch == model_dir
    model = build_model(cfg)
    assert model is not None


def test_reference_schema_drop_in(tmp_path):
    """Configs in the reference's nested hyperparameters:/data: schema load
    unchanged (tools/utils.py:14-26 compatibility)."""
    p = tmp_path / "ref.yaml"
    p.write_text(
        """
hyperparameters:
  model_arch: vit_som
  total_epochs: 7
  batch_size: 32
  gamma: 0.01
  som: {map_size: [6, 6], Tmax: 11, Tmin: 0.2, distance_fcn: cosine, topology: square, use_reduced: false}
  vit: {patch_size: 2, emb_dim: 16, depth: 2, heads: 2, dec_emb_dim: 8, dec_depth: 1}
  optimizer: {type: adamw, lr: 0.001}
data:
  dataset: mnist
  num_classes: 0
  num_channels: 1
  input_size: 28
"""
    )
    cfg = load_config(str(p))
    assert cfg.total_epochs == 7
    assert cfg.som.t_max == 11
    assert cfg.som.map_size == (6, 6)


def test_dataset_name_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("DATASET_NAME", "fmnist")
    cfg = load_config("configs/vit_som/vit_som_mnist.yaml")
    assert cfg.data.dataset == "fmnist"
