"""Learning-signal tests for the baseline families (swin / deit / mobile_vit).

The e2e smoke tests (test_baselines_e2e.py) prove the plumbing; these prove
the MODELS learn: on a fixed separable batch the train loss must drop
materially within a few dozen steps (the pattern established for vit_som at
tests/test_train_e2e.py::test_vit_som_cls_overfits_fixed_batch). Guards the
loss wiring, optimizer/schedule composition, stochastic-depth rng threading
and (mobile_vit) BatchNorm state updates for each family — a silently broken
gradient path passes a smoke test but cannot pass this.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitsom_tpu.config import load_config
from vitsom_tpu.train import steps as steps_lib
from vitsom_tpu.train.trainer import build_model, make_steps


def _fixed_batch(rng, n, h, w, c, k=10):
    """Separable class-conditional batch (template + noise)."""
    y = np.arange(n) % k
    templates = rng.uniform(0, 1, size=(k, h, w, c)).astype(np.float32)
    x = templates[y] * 0.6 + rng.uniform(0, 1, size=(n, h, w, c)).astype(
        np.float32
    ) * 0.4
    return {
        "image": jnp.asarray(x),
        "label": jnp.asarray(y, jnp.int32),
    }


def _overfit(config_path, overrides, batch, n_steps, min_drop):
    cfg = load_config(config_path, overrides=overrides)
    model = build_model(cfg)
    train_step, _, _, _, _, params, batch_stats = make_steps(
        cfg, model, dataset_len=len(batch["label"]) * 10, steps_per_epoch=10
    )
    state = steps_lib.TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=None,
        batch_stats=batch_stats,
    )
    # make_steps built tx internally; rebuild opt_state through it
    from vitsom_tpu.train import optim, schedules

    base_lr = optim.base_learning_rate(cfg)
    sched = schedules.make_lr_schedule(cfg.optimizer, cfg.total_epochs, 10, base_lr)
    tx = optim.make_optimizer(cfg, params, sched)
    state = state.replace(opt_state=tx.init(params))

    step = jax.jit(train_step)
    first = None
    for _ in range(n_steps):
        state, m = step(state, batch)
        loss = float(next(v for k, v in m.items() if k.endswith("loss")))
        if first is None:
            first = loss
    assert np.isfinite(loss), loss
    assert loss < first - min_drop, (first, loss)
    return cfg, model, state


def test_swin_learns_fixed_batch():
    rng = np.random.default_rng(0)
    batch = _fixed_batch(rng, 16, 32, 32, 3)
    _overfit(
        "configs/swin/swin_cifar-10.yaml",
        {
            "batch_size": 16,
            "total_epochs": 10,
            "swin.embed_dim": 24,
            "swin.depths": [1, 1],
            "swin.num_heads": [2, 4],
            "optimizer.scheduler": "constant",
            "optimizer.warmup_epochs": 0,
            "optimizer.lr": 0.003,
        },
        batch,
        n_steps=60,
        min_drop=0.3,
    )


def test_swin_dense_attention_matches_windowed():
    """The dense-masked window attention (models/swin.py
    ``dense_attn_constants`` — the TPU-fast path: no roll / partition /
    reverse, window structure as an additive mask) must reproduce the
    classic windowed computation exactly on the SAME parameters, shifted and
    unshifted blocks included. -1e9 cross-window entries underflow to
    softmax weight 0, so the two formulations agree to f32 roundoff."""
    from vitsom_tpu.models.swin import SwinTransformer

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, size=(4, 32, 32, 3)).astype(np.float32))
    kw = dict(
        img_size=32, patch_size=2, in_chans=3, num_classes=10,
        embed_dim=24, depths=(2, 2), num_heads=(2, 4), window=4,
        drop_path_rate=0.0,
    )
    dense = SwinTransformer(**kw)
    windowed = SwinTransformer(**kw, force_windowed=True)
    params = dense.init(jax.random.key(0), x, deterministic=True)["params"]
    # identical param trees: checkpoints are path-independent
    p2 = windowed.init(jax.random.key(0), x, deterministic=True)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    out_d = dense.apply({"params": params}, x, deterministic=True)
    out_w = windowed.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_w), rtol=2e-5, atol=2e-5
    )


def test_swin_bf16_learns_fixed_batch():
    """train.compute_dtype=bfloat16 swin (mixed precision: bf16 blocks, f32
    params/LN-stats/attention-softmax/head) must learn like the f32 model —
    guards the dtype threading added for the TPU benchmark recipe."""
    rng = np.random.default_rng(0)
    batch = _fixed_batch(rng, 16, 32, 32, 3)
    _overfit(
        "configs/swin/swin_cifar-10.yaml",
        {
            "batch_size": 16,
            "total_epochs": 10,
            "swin.embed_dim": 24,
            "swin.depths": [1, 1],
            "swin.num_heads": [2, 4],
            "optimizer.scheduler": "constant",
            "optimizer.warmup_epochs": 0,
            "optimizer.lr": 0.003,
            "train.compute_dtype": "bfloat16",
        },
        batch,
        n_steps=60,
        min_drop=0.3,
    )


def test_deit_learns_fixed_batch():
    rng = np.random.default_rng(1)
    batch = _fixed_batch(rng, 16, 32, 32, 3)
    _overfit(
        "configs/deit/deit_cifar-10.yaml",
        {
            "batch_size": 16,
            "total_epochs": 10,
            "vit.emb_dim": 32,
            "vit.depth": 2,
            "vit.heads": 2,
            "optimizer.scheduler": "constant",
            "optimizer.warmup_epochs": 0,
            "optimizer.lr": 0.002,
        },
        batch,
        n_steps=60,
        min_drop=0.3,
    )


def test_deit_bf16_learns_fixed_batch():
    """train.compute_dtype=bfloat16 + xla_bf16 score recipe for DeiT (bf16
    transformer/embeddings, f32 params/final-LN/heads/teacher) must learn
    like the f32 model — guards the dtype threading added for the TPU
    benchmark recipe (the r3 deit row's bfloat16 override was a silent
    no-op: the model had no dtype parameter)."""
    rng = np.random.default_rng(1)
    batch = _fixed_batch(rng, 16, 32, 32, 3)
    _overfit(
        "configs/deit/deit_cifar-10.yaml",
        {
            "batch_size": 16,
            "total_epochs": 10,
            "vit.emb_dim": 32,
            "vit.depth": 2,
            "vit.heads": 2,
            "optimizer.scheduler": "constant",
            "optimizer.warmup_epochs": 0,
            "optimizer.lr": 0.002,
            "train.compute_dtype": "bfloat16",
            "train.attn_impl": "xla_bf16",
        },
        batch,
        n_steps=60,
        min_drop=0.3,
    )


@pytest.mark.slow
def test_mobile_vit_bf16_learns_fixed_batch():
    """bf16 MobileViT (mixed precision convs/transformers, f32 params/BN
    stats/pool/head) must learn and still update BN running stats."""
    rng = np.random.default_rng(2)
    batch = _fixed_batch(rng, 8, 64, 64, 3)
    cfg, model, state = _overfit(
        "configs/mobile_vit/mobile_vit_cifar-10.yaml",
        {
            "batch_size": 8,
            "total_epochs": 10,
            "data.input_size": 64,
            "optimizer.scheduler": "constant",
            "optimizer.lr": 0.002,
            "train.compute_dtype": "bfloat16",
        },
        batch,
        n_steps=40,
        min_drop=0.25,
    )
    flat = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(jnp.abs(l).max()) > 1e-6 for l in flat)


@pytest.mark.slow
def test_mobile_vit_learns_fixed_batch():
    """MobileViT-S has no width knobs (fixed architecture); smallest viable
    input + batch keep this tractable on the CPU mesh. Also exercises BN
    batch_stats threading through the jitted step."""
    rng = np.random.default_rng(2)
    batch = _fixed_batch(rng, 8, 64, 64, 3)
    cfg, model, state = _overfit(
        "configs/mobile_vit/mobile_vit_cifar-10.yaml",
        {
            "batch_size": 8,
            "total_epochs": 10,
            "data.input_size": 64,
            "optimizer.scheduler": "constant",
            "optimizer.lr": 0.002,
        },
        batch,
        n_steps=40,
        min_drop=0.25,
    )
    # BN running stats must actually move off their init
    flat = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(float(jnp.abs(l).max()) > 1e-6 for l in flat)
