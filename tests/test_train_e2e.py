"""End-to-end trainer smoke tests on the virtual CPU mesh: short-horizon
training must reduce loss and improve purity over init (the TPU-native
version of the reference's integration-test-by-benchmark strategy,
SURVEY.md §4)."""

import numpy as np
import pytest

from vitsom_tpu.config import (
    AEConfig,
    Config,
    DataConfig,
    OptimizerConfig,
    SOMConfig,
    TrainConfig,
    ViTConfig,
)
from vitsom_tpu.data.pipeline import build_datamodule
from vitsom_tpu.train.trainer import Trainer


def desom_cfg(tmp_path, epochs=3):
    return Config(
        model_arch="desom",
        total_epochs=epochs,
        batch_size=64,
        gamma=0.001,
        som=SOMConfig(map_size=(6, 6), t_max=6.0, t_min=0.5, distance_fcn="manhattan"),
        ae=AEConfig(encoder_dims=(64, 10)),
        optimizer=OptimizerConfig(type="adam", lr=1e-3, scheduler="constant"),
        data=DataConfig(dataset="mnist", num_classes=0, num_channels=1, input_size=28,
                        allow_synthetic=True, synthetic_size=1024),
        train=TrainConfig(
            checkpoint_dir=str(tmp_path / "states"), log_dir=str(tmp_path / "logs"),
            n_runs=1,
        ),
    ).validate()


def test_desom_end_to_end_learns(tmp_path):
    cfg = desom_cfg(tmp_path)
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm)

    result = trainer.fit()
    m1 = trainer.evaluate()

    assert result["final_step"] == dm.steps_per_epoch * cfg.total_epochs
    # loss must fall across epochs
    losses = [v for _, v in trainer.logger.history["train/total_loss"]]
    assert losses[-1] < losses[0]
    # BMU assignments must beat the random-cluster baseline (1/k = 0.1)
    assert m1["purity"] > 0.12
    assert result["images_per_sec_per_chip"] > 0


def test_checkpoint_save_restore_roundtrip(tmp_path):
    cfg = desom_cfg(tmp_path, epochs=1)
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm)
    trainer.fit()
    m_before = trainer.evaluate()
    trainer.save_checkpoint(tag="last")

    # fresh trainer, restore, same metrics
    trainer2 = Trainer(cfg, dm=dm)
    trainer2.restore_checkpoint(tag="last")
    # restore must also bring back the step counter
    assert int(trainer2.state.step) == int(trainer.state.step)
    m_after = trainer2.evaluate()
    assert np.isclose(m_before["purity"], m_after["purity"])
    assert np.isclose(m_before["nmi"], m_after["nmi"])


def test_resume_continues_training(tmp_path):
    """Restore-and-continue: the checkpoint/resume path the reference never
    exercises (SURVEY.md §5) is a tested feature here."""
    cfg = desom_cfg(tmp_path, epochs=1)
    dm = build_datamodule(cfg)
    t1 = Trainer(cfg, dm=dm)
    t1.fit()
    t1.save_checkpoint(tag="last")
    step_after_1 = int(t1.state.step)

    t2 = Trainer(cfg, dm=dm)
    t2.restore_checkpoint(tag="last")
    t2.fit()  # one more epoch from the restored state
    assert int(t2.state.step) == step_after_1 + dm.steps_per_epoch


def test_vit_som_cls_trainer(tmp_path):
    cfg = Config(
        model_arch="vit_som",
        total_epochs=1,
        batch_size=32,
        gamma=0.01,
        som=SOMConfig(map_size=(4, 4), t_max=4.0, t_min=0.5, distance_fcn="cosine"),
        vit=ViTConfig(patch_size=4, emb_dim=16, depth=1, heads=2, dec_emb_dim=8, dec_depth=1),
        optimizer=OptimizerConfig(type="adamw", lr=5e-4, scheduler="cosine_annealing",
                                  warmup_epochs=1, smoothing=0.1),
        data=DataConfig(dataset="synthetic", num_classes=10, num_channels=3, input_size=32,
                        allow_synthetic=True, synthetic_size=256, num_workers=0),
        train=TrainConfig(checkpoint_dir=str(tmp_path / "s"), log_dir=str(tmp_path / "l")),
    ).validate()
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm)
    result = trainer.fit()
    metrics = trainer.evaluate()
    assert "accuracy" in metrics
    assert result["best_val_accuracy"] >= 0


def test_fused_val_matches_host_validation(tmp_path):
    """train.fused_val (validation scanned INSIDE the epoch device program,
    best-epoch params tracked in the scan carry) must reproduce the host
    validation path: same best_val_accuracy, and the persisted "best"
    checkpoint must load. Training is RNG-identical across the two modes;
    only where the val forward runs differs."""
    results = {}
    for fused in (False, True):
        cfg = Config(
            model_arch="vit_som",
            total_epochs=3,
            batch_size=32,
            gamma=0.01,
            som=SOMConfig(map_size=(4, 4), t_max=4.0, t_min=0.5,
                          distance_fcn="cosine"),
            vit=ViTConfig(patch_size=4, emb_dim=16, depth=1, heads=2,
                          dec_emb_dim=8, dec_depth=1),
            optimizer=OptimizerConfig(type="adamw", lr=5e-4,
                                      scheduler="constant", warmup_epochs=0),
            data=DataConfig(dataset="synthetic", num_classes=10,
                            num_channels=3, input_size=32,
                            allow_synthetic=True, synthetic_size=256,
                            num_workers=0),
            train=TrainConfig(
                checkpoint_dir=str(tmp_path / f"s{int(fused)}"),
                log_dir=str(tmp_path / f"l{int(fused)}"),
                n_runs=1, fused_val=fused,
            ),
        ).validate()
        dm = build_datamodule(cfg)
        trainer = Trainer(cfg, dm=dm, run_id=0)
        res = trainer.fit(progress=False)
        results[fused] = res["best_val_accuracy"]
        import os

        assert os.path.isdir(trainer.checkpoint_dir("best")), (
            "best checkpoint must exist in both modes"
        )
        trainer.restore_checkpoint(tag="best")
    # identical training stream; val math runs in a different program, so
    # allow float-accumulation slack on the accuracy ratio of a small split
    assert abs(results[True] - results[False]) <= 1.0 / 32 + 1e-6, results


def test_dp_8_devices_matches_single_device(tmp_path):
    """Data-parallel training over the 8-device mesh must reproduce the
    1-device run: same global batch, params replicated, XLA inserts the
    gradient reduction — losses and final params agree to float tolerance."""

    import jax

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    overrides = {
        "total_epochs": 2,
        "batch_size": 16,
        "ae.encoder_dims": [32, 8],
        "som.map_size": [4, 4],
        "data.allow_synthetic": True,
        "data.synthetic_size": 64,
        "train.n_runs": 1,
        "train.checkpoint_dir": str(tmp_path / "s"),
        "train.log_dir": str(tmp_path / "l"),
    }
    results = {}
    for n_dev in (1, 8):
        cfg = load_config(
            "configs/desom/desom_mnist.yaml",
            overrides={**overrides, "train.mesh_shape": [n_dev]},
        )
        dm = build_datamodule(cfg)
        t = Trainer(cfg, dm=dm, run_id=0)
        assert t.mesh.devices.size == n_dev
        t.fit(progress=False)
        results[n_dev] = jax.device_get(t.state.params)

    flat1 = jax.tree_util.tree_leaves(results[1])
    flat8 = jax.tree_util.tree_leaves(results[8])
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_vit_som_cls_overfits_fixed_batch():
    """The classification loss path must overfit a fixed separable batch
    (guards the CE+gamma*som loss, optimizer and schedule wiring — chance
    accuracy in short smoke runs is an LR-warmup artifact, not a bug)."""
    import jax
    import jax.numpy as jnp

    from vitsom_tpu.config import load_config
    from vitsom_tpu.train import optim, schedules
    from vitsom_tpu.train import steps as steps_lib
    from vitsom_tpu.models.vit_som import ViTSOM

    cfg = load_config("configs/vit_som/vit_som_cifar-10.yaml", overrides={
        "total_epochs": 100, "batch_size": 32,
        "vit.emb_dim": 32, "vit.depth": 2, "vit.heads": 2,
        "vit.dec_emb_dim": 16, "vit.dec_depth": 1,
        "som.map_size": [4, 4],
        "optimizer.scheduler": "constant", "optimizer.warmup_epochs": 0,
    })
    model = ViTSOM(cfg)
    rng = np.random.default_rng(0)
    y = np.arange(32) % 10
    templates = rng.uniform(0, 1, size=(10, 32, 32, 3)).astype(np.float32)
    x = jnp.asarray(
        templates[y] * 0.6 + rng.uniform(0, 1, size=(32, 32, 32, 3)).astype(np.float32) * 0.4
    )
    yj = jnp.asarray(y, jnp.int32)
    params = model.init(jax.random.key(0), x)["params"]
    st = steps_lib.StepStatics(10, 100, 320, 32)
    sched = schedules.make_lr_schedule(cfg.optimizer, 100, 10, optim.base_learning_rate(cfg))
    tx = optim.make_optimizer(cfg, params, sched)
    state = steps_lib.TrainState(
        step=jnp.asarray(0, jnp.int32), params=params, opt_state=tx.init(params)
    )
    step = jax.jit(steps_lib.make_vit_som_train_step(cfg, model, tx, st, sched))
    batch = {"image": x, "label": yj}
    first_loss = None
    for i in range(121):
        state, m = step(state, batch)
        if first_loss is None:
            first_loss = float(m["train/cls_loss"])
    final_loss = float(m["train/cls_loss"])
    logits = model.apply({"params": state.params}, x)[2]
    acc = float((jnp.argmax(logits, -1) == yj).mean())
    assert final_loss < first_loss - 0.15, (first_loss, final_loss)
    assert acc > 0.4, acc


def test_remat_blocks_numerics_identical():
    """remat_blocks recomputes the SAME ops in the backward; params after a
    few vit_som steps must match the non-remat run to float tolerance
    (different fusion boundaries reassociate sums -> ~1e-6-level drift per
    step through adamw, nothing more)."""
    import jax
    import jax.numpy as jnp

    from vitsom_tpu.config import load_config
    from vitsom_tpu.models.vit_som import ViTSOM
    from vitsom_tpu.train import optim, schedules
    from vitsom_tpu.train import steps as steps_lib

    results = {}
    for remat in (False, True):
        cfg = load_config("configs/vit_som/vit_som_mnist.yaml", overrides={
            "total_epochs": 2, "batch_size": 8,
            "som.map_size": [6, 6], "vit.depth": 2,
            "train.use_pallas_som": False,
            "train.remat_blocks": remat,
        })
        model = ViTSOM(cfg)
        x = jnp.asarray(
            np.random.default_rng(3).uniform(0, 1, (8, 28, 28, 1)).astype(np.float32)
        )
        params = model.init(jax.random.key(0), x)["params"]
        st = steps_lib.StepStatics(4, 2, 32, 8)
        sched = schedules.make_lr_schedule(
            cfg.optimizer, 2, 4, optim.base_learning_rate(cfg)
        )
        tx = optim.make_optimizer(cfg, params, sched)
        state = steps_lib.TrainState(
            step=jnp.asarray(0, jnp.int32), params=params, opt_state=tx.init(params)
        )
        step = jax.jit(steps_lib.make_vit_som_train_step(cfg, model, tx, st, sched))
        batch = {"image": x, "label": jnp.zeros((8,), jnp.int32)}
        for _ in range(3):
            state, _ = step(state, batch)
        results[remat] = jax.device_get(state.params)

    a = jax.tree_util.tree_leaves(results[False])
    b = jax.tree_util.tree_leaves(results[True])
    for u, v in zip(a, b):
        np.testing.assert_allclose(u, v, atol=1e-4, rtol=1e-4)


def test_stream_chunking_step_count(tmp_path):
    """steps_per_dispatch chunking must execute exactly steps_per_epoch
    steps per epoch (full chunks + ragged tail)."""
    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    cfg = load_config("configs/vit/vit_cifar-10.yaml", overrides={
        "total_epochs": 2,
        "batch_size": 8,
        "vit.emb_dim": 16, "vit.depth": 1, "vit.heads": 2,
        "vit.dec_emb_dim": 8, "vit.dec_depth": 1,
        "data.allow_synthetic": True,
        "data.synthetic_size": 70,  # train 56 -> 7 steps: 3 chunks of 2 + tail 1
        "data.num_workers": 0,
        "train.n_runs": 1,
        "train.steps_per_dispatch": 2,
        "train.checkpoint_dir": str(tmp_path / "s"),
        "train.log_dir": str(tmp_path / "l"),
    })
    dm = build_datamodule(cfg)
    assert not dm.is_static
    t = Trainer(cfg, dm=dm, run_id=0)
    t.fit(progress=False)
    assert int(t.state.step) == 2 * dm.steps_per_epoch


def test_epochs_per_dispatch_chunks(tmp_path):
    """epochs_per_dispatch > 1 (multi-epoch scan per dispatch, ragged tail)
    must execute the exact total step count and log per-epoch metrics for
    EVERY epoch."""
    cfg = desom_cfg(tmp_path, epochs=5)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs_per_dispatch=2)
    )
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm)
    trainer.fit(progress=False)
    assert int(trainer.state.step) == 5 * dm.steps_per_epoch
    losses = trainer.logger.history["train/total_loss"]
    assert len(losses) == 5  # one entry per EPOCH, not per dispatch
    assert losses[-1][1] < losses[0][1]
    # logged steps are each epoch's final step
    steps = [s for s, _ in losses]
    assert steps == [dm.steps_per_epoch * (i + 1) for i in range(5)]


def test_vit_som_learns_with_bf16_attention():
    """The shipped bench numerics (compute_dtype=bfloat16 +
    attn_impl=xla_bf16, remat off) must train end-to-end: recon loss falls
    materially over a few dozen steps on a fixed batch. Guards the
    bench.py default path."""
    import jax
    import jax.numpy as jnp

    from vitsom_tpu.config import load_config
    from vitsom_tpu.models.vit_som import ViTSOM
    from vitsom_tpu.train import optim, schedules
    from vitsom_tpu.train import steps as steps_lib

    cfg = load_config("configs/vit_som/vit_som_mnist.yaml", overrides={
        "total_epochs": 50, "batch_size": 16,
        "som.map_size": [4, 4],
        "train.compute_dtype": "bfloat16",
        "train.attn_impl": "xla_bf16",
        "train.remat_blocks": False,
        "optimizer.scheduler": "constant", "optimizer.warmup_epochs": 0,
    })
    model = ViTSOM(cfg, attn_impl="xla_bf16")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, size=(16, 28, 28, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    st = steps_lib.StepStatics(10, 50, 160, 16)
    sched = schedules.make_lr_schedule(
        cfg.optimizer, 50, 10, optim.base_learning_rate(cfg)
    )
    tx = optim.make_optimizer(cfg, params, sched)
    state = steps_lib.TrainState(
        step=jnp.asarray(0, jnp.int32), params=params, opt_state=tx.init(params)
    )
    step = jax.jit(steps_lib.make_vit_som_train_step(cfg, model, tx, st, sched))
    batch = {"image": x, "label": jnp.zeros((16,), jnp.int32)}
    first = None
    for _ in range(60):
        state, m = step(state, batch)
        if first is None:
            first = float(m["train/recon_loss"])
    final = float(m["train/recon_loss"])
    assert final < 0.6 * first, (first, final)


def test_scan_splits_sub_epoch_dispatch(tmp_path):
    """train.scan_splits > 1 (sub-epoch dispatching, trainer.
    _build_split_epoch_fn): same end state shape, falling loss, learning
    signal — the path mobile_vit needs because the tunneled worker dies on
    single dispatches over ~3-4 min (r5 triage)."""
    import dataclasses

    cfg = desom_cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, scan_splits=4)
    ).validate()
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm)

    result = trainer.fit()
    m = trainer.evaluate()

    assert result["final_step"] == dm.steps_per_epoch * cfg.total_epochs
    losses = [v for _, v in trainer.logger.history["train/total_loss"]]
    assert losses[-1] < losses[0]
    assert m["purity"] > 0.12
