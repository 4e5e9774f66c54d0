"""Swin / DeiT / MobileViT through the full Trainer on the CPU test mesh.

Tiny synthetic datasets + one epoch: exercises model build, the jitted
(stream-mode) classifier step, validation, and evaluation for each baseline
family end-to-end — the same path ``make train model=<m>`` takes.
"""

import numpy as np
import pytest

from vitsom_tpu.config import load_config
from vitsom_tpu.data.pipeline import build_datamodule
from vitsom_tpu.train.trainer import Trainer


def _run(config_path, tmp_path, overrides):
    base = {
        "total_epochs": 1,
        "batch_size": 8,
        "data.allow_synthetic": True,
        "data.synthetic_size": 48,
        "data.num_workers": 0,
        "train.n_runs": 1,
        "train.checkpoint_dir": str(tmp_path / "states"),
        "train.log_dir": str(tmp_path / "logs"),
    }
    base.update(overrides)
    cfg = load_config(config_path, overrides=base)
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm, run_id=0)
    trainer.fit(progress=False)
    assert int(trainer.state.step) > 0
    metrics = trainer.evaluate()
    assert 0.0 <= metrics["accuracy"] <= 1.0
    return metrics


def test_swin_end_to_end(tmp_path):
    _run("configs/swin/swin_cifar-10.yaml", tmp_path, {})


def test_deit_end_to_end(tmp_path):
    _run("configs/deit/deit_cifar-10.yaml", tmp_path, {})


def test_mobile_vit_end_to_end(tmp_path):
    # mobile_vit configs force input 224; shrink for CPU (any multiple of 2)
    _run(
        "configs/mobile_vit/mobile_vit_cifar-10.yaml",
        tmp_path,
        {"data.input_size": 64},
    )
