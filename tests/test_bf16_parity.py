"""bf16 compute-dtype drift bounds on NON-separable synthetic data.

The bench claims bf16 quality parity; trivially-separable blobs can't
falsify that (everything clusters perfectly). These tests train the real
vit_som step on heavily-overlapped class data in f32 and bf16 from the same
init and bound the divergence of the actual training signals."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitsom_tpu.config import load_config
from vitsom_tpu.models.vit_som import ViTSOM
from vitsom_tpu.train import optim, schedules
from vitsom_tpu.train import steps as steps_lib


def _overlapped_batch(n=32, seed=0):
    """Templates drowned in noise: nearest-template accuracy of the raw
    pixels is well below 1, so the SOM/recon losses stay informative."""
    rng = np.random.default_rng(seed)
    y = np.arange(n) % 10
    templates = rng.uniform(0, 1, size=(10, 28, 28, 1)).astype(np.float32)
    x = templates[y] * 0.35 + rng.uniform(0, 1, size=(n, 28, 28, 1)).astype(
        np.float32
    ) * 0.65
    return jnp.asarray(x), jnp.asarray(y, jnp.int32)


def _train(dtype: str, n_steps=60):
    cfg = load_config("configs/vit_som/vit_som_mnist.yaml", overrides={
        "total_epochs": 4, "batch_size": 32,
        "som.map_size": [8, 8], "vit.depth": 2,
        "train.use_pallas_som": False,
        "train.compute_dtype": dtype,
    })
    model = ViTSOM(cfg)
    x, y = _overlapped_batch()
    params = model.init(jax.random.key(0), x)["params"]
    st = steps_lib.StepStatics(15, 4, 480, 32)
    sched = schedules.make_lr_schedule(cfg.optimizer, 4, 15, optim.base_learning_rate(cfg))
    tx = optim.make_optimizer(cfg, params, sched)
    state = steps_lib.TrainState(
        step=jnp.asarray(0, jnp.int32), params=params, opt_state=tx.init(params)
    )
    step = jax.jit(steps_lib.make_vit_som_train_step(cfg, model, tx, st, sched))
    batch = {"image": x, "label": y}
    losses = []
    for _ in range(n_steps):
        state, m = step(state, batch)
        losses.append(m)
    host = jax.device_get(losses)
    recon = np.asarray([float(m["train/recon_loss"]) for m in host])
    som = np.asarray([float(m["train/som_loss"]) for m in host])
    return recon, som, state


def test_bf16_tracks_f32_on_overlapped_data():
    r32, s32, st32 = _train("float32")
    r16, s16, st16 = _train("bfloat16")

    assert np.isfinite(r16).all() and np.isfinite(s16).all()
    # both must actually learn (loss falls materially)
    assert r32[-5:].mean() < r32[:5].mean() * 0.9
    assert r16[-5:].mean() < r16[:5].mean() * 0.9
    # terminal losses agree within bf16-expected drift
    assert abs(r16[-5:].mean() - r32[-5:].mean()) / r32[-5:].mean() < 0.05, (
        r32[-5:].mean(), r16[-5:].mean())
    assert abs(s16[-5:].mean() - s32[-5:].mean()) / max(s32[-5:].mean(), 1e-9) < 0.10, (
        s32[-5:].mean(), s16[-5:].mean())


def test_bf16_bmu_assignments_mostly_agree():
    """BMU assignment (what purity is computed from) must be robust to the
    compute dtype of the FORWARD pass: same trained params, f32 vs bf16
    encoder, overwhelming BMU agreement."""
    _, _, state = _train("float32", n_steps=30)
    params = jax.device_get(state.params)
    x, _ = _overlapped_batch(seed=7)

    bmus = {}
    for dtype in ("float32", "bfloat16"):
        cfg = load_config("configs/vit_som/vit_som_mnist.yaml", overrides={
            "total_epochs": 4, "batch_size": 32, "som.map_size": [8, 8],
            "vit.depth": 2, "train.use_pallas_som": False,
            "train.compute_dtype": dtype,
        })
        model = ViTSOM(cfg)
        bmus[dtype] = np.asarray(model.apply({"params": params}, x)[4])
    agree = (bmus["float32"] == bmus["bfloat16"]).mean()
    assert agree > 0.85, agree
