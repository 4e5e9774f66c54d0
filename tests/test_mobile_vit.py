"""MobileViT-S tests: forward shapes, unfold/fold inverse, BatchNorm
threading through the classifier train step."""

import jax
import jax.numpy as jnp
import numpy as np

from vitsom_tpu.config import Config, DataConfig, OptimizerConfig
from vitsom_tpu.models.mobile_vit import MobileViTS, _fold, _unfold, build_mobilevit_s


def test_unfold_fold_roundtrip():
    x = jnp.asarray(np.random.rand(2, 8, 12, 5), jnp.float32)
    tokens, hw = _unfold(x, 2)
    assert tokens.shape == (2, 4, 4 * 6, 5)
    np.testing.assert_allclose(np.asarray(_fold(tokens, 2, hw)), np.asarray(x))


def test_mobilevit_forward_shapes():
    model = MobileViTS(num_classes=10)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    assert "batch_stats" in variables
    logits = model.apply(variables, x)
    assert logits.shape == (2, 10)


def test_mobilevit_odd_resolution():
    """Input whose deepest stage is odd (224-like path): 96 -> stage5 3x3."""
    model = MobileViTS(num_classes=4)
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 4)


def test_mobilevit_train_step_updates_batch_stats():
    from vitsom_tpu.train import optim, schedules
    from vitsom_tpu.train import steps as steps_lib

    cfg = Config(
        model_arch="mobile_vit",
        total_epochs=1,
        batch_size=2,
        optimizer=OptimizerConfig(type="adamw", lr=1e-3, scheduler="constant"),
        data=DataConfig(dataset="cifar-10", num_classes=10, num_channels=3, input_size=64),
    ).validate()
    model = build_mobilevit_s(cfg)
    x = jnp.asarray(np.random.rand(2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    params, batch_stats = variables["params"], variables["batch_stats"]
    sched = schedules.make_lr_schedule(cfg.optimizer, 1, 4, cfg.optimizer.lr)
    tx = optim.make_optimizer(cfg, params, sched)
    state = steps_lib.TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
    )
    step_fn = jax.jit(
        steps_lib.make_classifier_train_step(
            cfg, model, tx, sched, smoothing=0.1, has_batch_stats=True
        )
    )
    batch = {"image": x, "label": jnp.asarray([1, 3], jnp.int32)}
    new_state, metrics = step_fn(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["train/cls_loss"]))
    # running BN stats must have moved
    before = jax.tree_util.tree_leaves(batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
