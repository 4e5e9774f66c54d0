"""Checkpoint/resume tests (orbax) + SOM quality metrics.

SURVEY.md §5: the reference never exercises mid-run resume; here
restore-and-continue is a tested path.
"""

import numpy as np
import pytest

from vitsom_tpu.eval import metrics


def test_quantization_error():
    d = np.array([[3.0, 1.0, 2.0], [0.5, 4.0, 6.0]])
    assert metrics.quantization_error(d) == pytest.approx((1.0 + 0.5) / 2)


def test_topographic_error_square():
    # 2x2 map: prototypes 0,1 adjacent; 0,3 diagonal (adjacent under
    # 8-neighborhood); to get an error, use a 1x3 map: 0 and 2 not adjacent
    d = np.array(
        [
            [0.1, 0.2, 0.9],  # best 0, second 1 -> adjacent
            [0.1, 0.9, 0.2],  # best 0, second 2 -> NOT adjacent
        ]
    )
    te = metrics.topographic_error(d, (1, 3), "square")
    assert te == pytest.approx(0.5)


def test_checkpoint_restore_and_continue(tmp_path):
    """Train 1 epoch, checkpoint, restore into a FRESH trainer, continue
    training — step counter and params must carry over exactly."""
    import jax

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    overrides = {
        "total_epochs": 2,
        "batch_size": 16,
        "data.allow_synthetic": True,
        "data.synthetic_size": 64,
        "train.n_runs": 1,
        "train.checkpoint_dir": str(tmp_path / "states"),
        "train.log_dir": str(tmp_path / "logs"),
        "ae.encoder_dims": [32, 8],
        "som.map_size": [4, 4],
    }
    cfg = load_config("configs/desom/desom_mnist.yaml", overrides=overrides)
    dm = build_datamodule(cfg)

    t1 = Trainer(cfg, dm=dm, run_id=0)
    t1.fit(progress=False)
    step_after_fit = int(t1.state.step)
    assert step_after_fit > 0
    t1.save_checkpoint(tag="last")

    t2 = Trainer(cfg, dm=dm, run_id=0)
    assert int(t2.state.step) == 0
    t2.restore_checkpoint(tag="last")
    assert int(t2.state.step) == step_after_fit
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continue training from the restored state
    t2.fit(progress=False)
    assert int(t2.state.step) == 2 * step_after_fit


def test_config_dict_roundtrip():
    """config_from_dict(cfg.to_dict()) must be the identical Config."""
    from vitsom_tpu.config import config_from_dict, load_config

    for path in (
        "configs/vit_som/vit_som_mnist.yaml",
        "configs/desom/desom_mnist.yaml",
        "configs/swin/swin_cifar-10.yaml",
    ):
        cfg = load_config(path)
        assert config_from_dict(cfg.to_dict()) == cfg


def test_checkpoint_embeds_config(tmp_path):
    """Checkpoints carry their config (save_hyperparameters parity,
    reference models/vit_som.py:26): restorable standalone, and a
    structural config mismatch on restore fails loudly."""
    import dataclasses

    import pytest as _pytest

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer, load_checkpoint_config

    overrides = {
        "total_epochs": 1,
        "batch_size": 16,
        "data.allow_synthetic": True,
        "data.synthetic_size": 32,
        "train.n_runs": 1,
        "train.checkpoint_dir": str(tmp_path / "states"),
        "train.log_dir": str(tmp_path / "logs"),
        "ae.encoder_dims": [32, 8],
        "som.map_size": [4, 4],
    }
    cfg = load_config("configs/desom/desom_mnist.yaml", overrides=overrides)
    dm = build_datamodule(cfg)
    t = Trainer(cfg, dm=dm, run_id=0)
    t.fit(progress=False)
    t.save_checkpoint(tag="last")

    saved = load_checkpoint_config(t.checkpoint_dir("last"))
    assert saved == cfg

    # structural mismatch (different SOM grid -> different prototype shape)
    bad_cfg = dataclasses.replace(
        cfg, som=dataclasses.replace(cfg.som, map_size=(8, 8))
    )
    t_bad = Trainer(bad_cfg, dm=build_datamodule(bad_cfg), run_id=0)
    with _pytest.raises(ValueError, match="som"):
        t_bad.restore_checkpoint(tag="last")


def test_eval_checkpoint_from_checkpoint_alone(tmp_path):
    """eval_checkpoint.py --checkpoint <dir> runs with no --config."""
    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    overrides = {
        "total_epochs": 1,
        "batch_size": 16,
        "data.allow_synthetic": True,
        "data.synthetic_size": 32,
        "train.n_runs": 1,
        "train.checkpoint_dir": str(tmp_path / "states"),
        "train.log_dir": str(tmp_path / "logs"),
        "ae.encoder_dims": [32, 8],
        "som.map_size": [4, 4],
    }
    cfg = load_config("configs/desom/desom_mnist.yaml", overrides=overrides)
    dm = build_datamodule(cfg)
    t = Trainer(cfg, dm=dm, run_id=0)
    t.fit(progress=False)
    t.save_checkpoint(tag="last")

    import sys

    sys.path.insert(0, "experiments/tests")
    try:
        import eval_checkpoint

        results = eval_checkpoint.main(
            ["--checkpoint", t.checkpoint_dir("last"), "--no-kmeans"]
        )
    finally:
        sys.path.pop(0)
    assert 0.0 <= results["purity"] <= 1.0


def test_desom_batchnorm_end_to_end(tmp_path):
    """DESOM with ae.batch_norm=true: BN stats must thread through the train
    step, the bound eval step, and checkpoints (regression: eval_fn used to
    pass batch_stats to a 3-arg desom eval step and crash)."""
    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    cfg = load_config(
        "configs/desom/desom_mnist.yaml",
        overrides={
            "total_epochs": 1,
            "batch_size": 16,
            "ae.batch_norm": True,
            "ae.encoder_dims": [32, 8],
            "som.map_size": [4, 4],
            "data.allow_synthetic": True,
            "data.synthetic_size": 64,
            "train.n_runs": 1,
            "train.checkpoint_dir": str(tmp_path / "states"),
            "train.log_dir": str(tmp_path / "logs"),
        },
    )
    dm = build_datamodule(cfg)
    t = Trainer(cfg, dm=dm, run_id=0)
    assert t.state.batch_stats is not None
    t.fit(progress=False)
    metrics = t.evaluate()
    assert 0.0 <= metrics["purity"] <= 1.0
    t.save_checkpoint(tag="last")
    t2 = Trainer(cfg, dm=dm, run_id=0)
    t2.restore_checkpoint(tag="last")
    import jax
    import numpy as np

    for a, b in zip(
        jax.tree_util.tree_leaves(t.state.batch_stats),
        jax.tree_util.tree_leaves(t2.state.batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
