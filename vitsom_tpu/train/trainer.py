"""Trainer: device-resident epoch scans, DP mesh, checkpointing, logging.

Replaces PyTorch-Lightning's Trainer (the reference delegates its entire
loop to ``pl.Trainer.fit``, ``/root/reference/experiments/benchmarking/
train_vit_som.py:86-93``) with two TPU-native execution modes:

- **scan mode** (static-transform datasets): the whole dataset lives in HBM;
  one jitted function runs a full epoch as ``lax.scan`` over device-side
  permuted gathers. Python dispatches once per epoch, not per step.
- **stream mode** (augmented datasets): multiprocess host augmentation with
  device prefetch; one jitted step per batch.

Both modes run over a ``('data',)`` Mesh: params replicated, batch sharded.
Checkpointing is orbax (params + opt state + step), monitored on
val/accuracy for classification (best) or save-last for clustering, matching
the reference's ModelCheckpoint policy (``train_vit_som.py:81-84``).
TensorBoard tags match the reference names so dashboards carry over.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vitsom_tpu.config import Config
from vitsom_tpu.data.pipeline import (
    DataModule,
    build_datamodule,
    chunked_device_prefetch,
)
from vitsom_tpu.eval import evaluate as eval_lib
from vitsom_tpu.parallel import distributed as dist_lib
from vitsom_tpu.parallel import mesh as mesh_lib
from vitsom_tpu.som import layer as som
from vitsom_tpu.train import optim, schedules
from vitsom_tpu.train import steps as steps_lib
from vitsom_tpu.utils.logging import MetricLogger


# ---------------------------------------------------------------------------
# model registry
# ---------------------------------------------------------------------------


def build_model(cfg: Config, attn_impl: Optional[str] = None):
    impl = attn_impl or cfg.train.attn_impl or (
        "pallas" if cfg.train.use_pallas_attention else "xla"
    )
    if cfg.model_arch == "vit_som":
        from vitsom_tpu.models.vit_som import ViTSOM

        return ViTSOM(cfg, attn_impl=impl)
    if cfg.model_arch == "desom":
        from vitsom_tpu.models.desom import DESOM

        return DESOM(cfg)
    if cfg.model_arch == "vit":
        from vitsom_tpu.models.vit_som import ViTClassifier

        return ViTClassifier(cfg, attn_impl=impl)
    if cfg.model_arch == "swin":
        from vitsom_tpu.models.swin import build_swin

        return build_swin(cfg, attn_impl=impl)
    if cfg.model_arch == "deit":
        from vitsom_tpu.models.deit import DeiT

        return DeiT(cfg)
    if cfg.model_arch == "mobile_vit":
        from vitsom_tpu.models.mobile_vit import build_mobilevit_s

        return build_mobilevit_s(cfg)
    raise ValueError(f"unknown model_arch {cfg.model_arch}")


def example_input(cfg: Config, batch: Optional[int] = None) -> jnp.ndarray:
    b = batch or cfg.batch_size
    s, c = cfg.data.input_size, cfg.data.num_channels
    if cfg.model_arch == "desom":
        return jnp.zeros((b, c * s * s), jnp.float32)
    return jnp.zeros((b, s, s, c), jnp.float32)


def _host_cpu_device():
    """The host CPU device, for running init-time programs that are not
    worth a device compile (falls back to the default backend if the cpu
    platform is unavailable)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def host_init_variables(cfg: Config, model, run_id: int = 0):
    """Initialize model variables on the HOST CPU backend: on tunneled TPU
    backends the init-forward compile alone costs 30-190 s before training
    starts (measured; see CLAUDE.md). Init math is deterministic across
    platforms (threefry RNG + initializer arithmetic), so host init + one
    bulk transfer (put_replicated) replaces an entire device compile."""
    with jax.default_device(_host_cpu_device()):
        x = example_input(cfg, batch=2)
        init_key = jax.random.fold_in(jax.random.key(cfg.train.seed), run_id)
        # jit the whole init: un-jitted Flax init runs hundreds of eager
        # host ops, each individually compiled (~10-20 s of CPU compiles
        # per process); one jitted program is persistent-cache-hot across
        # processes
        variables = jax.jit(model.init)(init_key, x)
    return variables["params"], variables.get("batch_stats")


def make_steps(cfg: Config, model, dataset_len: int, steps_per_epoch: int,
               run_id: int = 0, mesh=None):
    """Build (train_step, eval_step, statics, lr_schedule, tx) for a model.

    ``run_id`` folds into the init key so the benchmark's N runs start from
    distinct initializations (the reference seeds once and lets RNG flow
    across runs, ``train_vit_som.py:36`` — same effective behavior)."""
    statics = steps_lib.StepStatics(
        steps_per_epoch=steps_per_epoch,
        total_epochs=cfg.total_epochs,
        dataset_len=dataset_len,
        batch_size=cfg.batch_size,
    )
    base_lr = optim.base_learning_rate(cfg)
    if cfg.model_arch == "swin":
        lr_sched = schedules.make_swin_lr_schedule(
            cfg.optimizer, cfg.total_epochs, steps_per_epoch, base_lr
        )
    else:
        lr_sched = schedules.make_lr_schedule(
            cfg.optimizer, cfg.total_epochs, steps_per_epoch, base_lr
        )

    params, batch_stats = host_init_variables(cfg, model, run_id)
    tx = optim.make_optimizer(cfg, params, lr_sched)

    if cfg.model_arch == "vit_som":
        train_step = steps_lib.make_vit_som_train_step(
            cfg, model, tx, statics, lr_sched, mesh=mesh
        )
        eval_step = steps_lib.make_vit_som_eval_step(cfg, model)
    elif cfg.model_arch == "desom":
        train_step = steps_lib.make_desom_train_step(cfg, model, tx, statics, lr_sched)
        eval_step = steps_lib.make_desom_eval_step(cfg, model)
    elif cfg.model_arch == "deit":
        from vitsom_tpu.models.deit import make_deit_train_step

        train_step = make_deit_train_step(cfg, model, tx, lr_sched)
        eval_step = steps_lib.make_classifier_eval_step(cfg, model)
    else:
        smoothing = cfg.optimizer.smoothing if cfg.model_arch != "vit" else 0.0
        has_bs = batch_stats is not None
        train_step = steps_lib.make_classifier_train_step(
            cfg, model, tx, lr_sched, smoothing, has_batch_stats=has_bs
        )
        eval_step = steps_lib.make_classifier_eval_step(
            cfg, model, has_batch_stats=has_bs
        )

    return train_step, eval_step, statics, lr_sched, tx, params, batch_stats


# ---------------------------------------------------------------------------
# checkpoint-embedded config (reference save_hyperparameters parity,
# /root/reference/models/vit_som.py:26)
# ---------------------------------------------------------------------------

_CKPT_CONFIG_FILE = "vitsom_config.yaml"

# Fields that define the parameter-tree structure: a mismatch here means the
# checkpoint cannot be restored into this trainer's state and must be fatal.
_STRUCTURAL_KEYS = ("model_arch", "som", "vit", "ae", "swin", "distillation")
_STRUCTURAL_DATA_KEYS = ("num_classes", "num_channels", "input_size")


def save_checkpoint_config(ckpt_path: str, cfg: Config) -> None:
    """Write the full config into the checkpoint directory (after orbax has
    finished, so the file does not race the checkpoint manifest)."""
    import yaml

    with open(os.path.join(ckpt_path, _CKPT_CONFIG_FILE), "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)


def load_checkpoint_config(ckpt_path: str) -> Optional[Config]:
    """Rebuild the Config embedded in a checkpoint (None for pre-embedding
    checkpoints)."""
    import yaml

    from vitsom_tpu.config import config_from_dict

    path = os.path.join(ckpt_path, _CKPT_CONFIG_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return config_from_dict(yaml.safe_load(f))


def check_checkpoint_config(ckpt_path: str, cfg: Config) -> None:
    """Fail loudly when a checkpoint's embedded config disagrees with the
    trainer's on any structure-defining field; warn on soft differences
    (schedules, host-loop knobs) that change behavior but not the tree."""
    saved = load_checkpoint_config(ckpt_path)
    if saved is None:
        return
    a, b = saved.to_dict(), cfg.to_dict()
    hard = [
        k for k in _STRUCTURAL_KEYS if a[k] != b[k]
    ] + [
        f"data.{k}"
        for k in _STRUCTURAL_DATA_KEYS
        if a["data"][k] != b["data"][k]
    ]
    if hard:
        raise ValueError(
            f"checkpoint at {ckpt_path} was saved with a different model "
            f"config (mismatched: {', '.join(hard)}) — refusing to restore; "
            f"evaluate it via its embedded config instead "
            f"(eval_checkpoint.py --checkpoint {ckpt_path})"
        )
    soft = [
        k
        for k in ("total_epochs", "batch_size", "gamma", "optimizer")
        if a[k] != b[k]
    ]
    if soft:
        import warnings

        warnings.warn(
            f"checkpoint config differs on non-structural fields "
            f"({', '.join(soft)}) — schedules (lr/temperature/gamma) derived "
            f"from the current config will not match the training run"
        )


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


class Trainer:
    def __init__(self, cfg: Config, dm: Optional[DataModule] = None, run_id: int = 0):
        # multi-host: joins the jax.distributed runtime when the coordinator
        # env vars are set (no-op single-process); after this jax.devices()
        # is the GLOBAL device list so the Mesh spans hosts (SURVEY §2c)
        dist_lib.maybe_initialize()
        _t0 = time.time()
        _marks = [] if os.environ.get("VITSOM_TIMING") else None

        def _mark(label):
            if _marks is not None:
                _marks.append((label, time.time() - _t0))

        self.cfg = cfg
        self.dm = dm or build_datamodule(cfg)
        self.run_id = run_id
        self.mesh = mesh_lib.make_mesh(
            cfg.train.mesh_shape[0] if cfg.train.mesh_shape else None
        )
        n_dev = self.mesh.devices.size
        if cfg.batch_size % n_dev != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide evenly across the "
                f"{n_dev}-device data-parallel mesh"
            )
        # On a >1-device mesh the fused SOM kernel runs under shard_map (one
        # kernel per batch shard, pmean'd loss) — see
        # som_pallas.make_fused_som_sharded; no fallback to the XLA path.
        self.model = build_model(cfg)
        _mark("mesh+model")
        (
            self._train_step,
            self._eval_step,
            self.statics,
            self.lr_schedule,
            self.tx,
            init_params,
            init_batch_stats,
        ) = make_steps(
            cfg, self.model, self.dm.n_train, self.dm.steps_per_epoch,
            run_id=run_id, mesh=self.mesh,
        )

        # optimizer state is built on the host too (zeros/moments of the
        # host-resident init params), then everything crosses the tunnel in
        # one bulk replicated put — no init-time device compiles at all
        _mark("make_steps(host init)")
        with jax.default_device(_host_cpu_device()):
            host_opt_state = jax.jit(self.tx.init)(init_params)
        _mark("opt_init(host)")
        params = mesh_lib.put_replicated(init_params, self.mesh)
        batch_stats = (
            mesh_lib.put_replicated(init_batch_stats, self.mesh)
            if init_batch_stats is not None
            else None
        )
        opt_state = mesh_lib.put_replicated(host_opt_state, self.mesh)
        self.state = steps_lib.TrainState(
            # every leaf (scalar step included) on the canonical sharding:
            # a mismatched leaf makes the SECOND dispatch of every jit here
            # silently recompile (see mesh.canonical_state_sharding)
            step=mesh_lib.put_replicated(jnp.asarray(0, jnp.int32), self.mesh),
            params=params,
            opt_state=opt_state,
            batch_stats=batch_stats,
        )
        self._state_sharding = mesh_lib.canonical_state_sharding(self.mesh)
        _mark("state_put")

        donate = (0,) if cfg.train.donate_state else ()
        self._jit_step = jax.jit(
            self._wrap_sharded(self._train_step),
            donate_argnums=donate,
            out_shardings=(self._state_sharding, self._state_sharding),
        )
        self._jit_eval = jax.jit(self._eval_step)
        self._jit_epoch = None  # built lazily in scan mode
        self._jit_decode_images = None  # built lazily by _maybe_log_images
        # epoch programs cached ACROSS fit() calls keyed by
        # (n_epochs, val_steps, augment-on): the in-process pre-execution
        # protocol (fit(compile_only=True) then reset_state() then fit())
        # depends on the timed fit() reusing the exact warm executables the
        # pre-exec call dispatched — a rebuilt jit closure is a NEW
        # executable and pays the 10-20x first-execution upload/warm-up
        # again (CLAUDE.md)
        self._epoch_fn_cache: Dict[Tuple[int, int, bool], Any] = {}
        self._device_aug_fn = None  # cached with the epoch programs

        # process 0 owns the TensorBoard writer; other hosts keep the
        # in-memory history only (tags/steps identical — params replicated)
        self.logger = MetricLogger(
            os.path.join(
                cfg.train.log_dir, cfg.model_arch, cfg.data.dataset, f"run_{run_id}"
            )
            if dist_lib.is_primary()
            else None
        )
        self.history: Dict[str, list] = {}
        self.peak_memory_gb = 0.0
        self.memory_metric = "unavailable"
        # zero-arg closure installed by fit(): AOT-lowers the main training
        # program and reports XLA's static memory_analysis (see
        # Trainer.memory_analysis)
        self._memory_probe = None
        if _marks is not None:
            import sys as _sys

            print(
                "# init timing: "
                + " ".join(f"{k}={v:.1f}s" for k, v in _marks),
                file=_sys.stderr,
            )

    def reset_state(self, run_id: Optional[int] = None,
                    dm: Optional[DataModule] = None) -> None:
        """Re-initialize params / optimizer state / step to exactly what a
        fresh ``Trainer(cfg, run_id=run_id)`` would build, while keeping the
        already-jitted (and already-executed — i.e. warm) step and epoch
        programs.

        This is the second half of the in-process pre-execution protocol
        (VERDICT r4 #4): the harness compiles + pre-executes the epoch
        program via ``fit(compile_only=True)`` BEFORE the timed region, then
        calls ``reset_state()`` inside the timer — paying model/optimizer
        (re)initialization where the reference pays its model build
        (``train_vit_som.py:76-91``) but not the backend's 10-20x
        first-execution executable warm-up, which the reference's
        precompiled, resident CUDA kernels never pay at all."""
        if run_id is not None and run_id != self.run_id:
            self.run_id = run_id
            self.logger = MetricLogger(
                os.path.join(
                    self.cfg.train.log_dir, self.cfg.model_arch,
                    self.cfg.data.dataset, f"run_{run_id}"
                )
                if dist_lib.is_primary()
                else None
            )
        if dm is not None:
            self.dm = dm
        init_params, init_batch_stats = host_init_variables(
            self.cfg, self.model, self.run_id
        )
        with jax.default_device(_host_cpu_device()):
            host_opt_state = jax.jit(self.tx.init)(init_params)
        self.state = steps_lib.TrainState(
            step=mesh_lib.put_replicated(jnp.asarray(0, jnp.int32), self.mesh),
            params=mesh_lib.put_replicated(init_params, self.mesh),
            opt_state=mesh_lib.put_replicated(host_opt_state, self.mesh),
            batch_stats=(
                mesh_lib.put_replicated(init_batch_stats, self.mesh)
                if init_batch_stats is not None
                else None
            ),
        )
        self.history = {}
        self.peak_memory_gb = 0.0
        self.memory_metric = "unavailable"

    # -- sharding wrapper --------------------------------------------------

    def _wrap_sharded(self, step_fn):
        mesh = self.mesh

        def wrapped(state, batch):
            batch = mesh_lib.shard_batch(batch, mesh)
            return step_fn(state, batch)

        return wrapped

    # -- scan mode ---------------------------------------------------------

    def _build_epoch_fn(self, augment_fn=None, n_epochs: int = 1,
                        val_steps: int = 0):
        """Whole-epoch program: permutation + bulk gather + scan of steps,
        scanned over ``n_epochs`` epochs per dispatch.

        ``val_steps > 0`` (``train.fused_val``, classification scan mode)
        appends the per-epoch validation pass INSIDE the same program: the
        eval step scans the ``val_steps`` pre-batched val batches after each
        epoch, accuracy/val losses reduce on device into the returned metric
        stacks (``val/*`` tags — parity with ``_maybe_validate``), and the
        best-epoch params (+ batch_stats) are tracked in the scan carry with
        a ``jnp.where`` select. The host loop then never needs a per-epoch
        eval dispatch or logits transfer; the best checkpoint is written once
        after the run from the tracked params — the same artifact the
        save-on-improvement host path produces.

        With ``augment_fn`` (device-augment mode) the gathered batches are
        RAW uint8 and the full augmentation stack runs inside the scan body —
        the epoch, augmentation included, is ONE compiled program with zero
        host involvement (vs. the reference's 16 DataLoader workers,
        ``/root/reference/data/data.py:317-340``).

        ``n_epochs > 1`` (``train.epochs_per_dispatch``) chains epochs in an
        outer scan: on tunneled backends every dispatch + metric pull costs
        a host RTT (~65 ms), which for a ~1 s epoch is a measured ~2x
        end-to-end overhead across a 500-epoch protocol. Returns per-epoch
        mean/last metric stacks ([n_epochs]-leaved)."""
        steps = self.dm.steps_per_epoch
        bs = self.cfg.batch_size
        train_step = self._train_step
        mesh = self.mesh

        def one_epoch(state, key, images, labels):
            # One bulk gather per epoch (contiguous [steps, bs, ...] batches),
            # NOT one gather per step inside the scan — per-step gathers from
            # the full dataset cost ~3x the train step itself on TPU.
            #
            # The gather runs on a FLATTENED [N, H*W*C] operand and the
            # stacked epoch buffer stays flat: gathering [N, 28, 28, 1] rows
            # wastes almost all 128 lanes of the tiled minor dims (28, 1) and
            # profiled at 54.5 ms/epoch; the flat-row gather of identical
            # bytes measured 30 ms (take_4d 72.6 ms vs take_flat 30.1 ms,
            # fenced microbench, v5e). The per-step reshape back to NHWC in
            # the scan body fuses into the first model op.
            sample_shape = images.shape[1:]
            flat = images.reshape(images.shape[0], -1)
            perm_key, aug_key = jax.random.split(key)
            perm = jax.random.permutation(perm_key, images.shape[0])[: steps * bs]
            imgs = jnp.take(flat, perm, axis=0).reshape(steps, bs, -1)
            lbls = jnp.take(labels, perm, axis=0).reshape(steps, bs)
            # sharding constraint ONCE on the stacks — inside the scan body it
            # costs ~8x per epoch (see mesh.shard_stacked_batches)
            stacked = mesh_lib.shard_stacked_batches(
                {"image": imgs, "label": lbls}, mesh
            )

            def body(state, xs):
                step_key, batch = xs
                batch = {
                    "image": batch["image"].reshape((bs,) + sample_shape),
                    "label": batch["label"],
                }
                if augment_fn is not None:
                    batch = {
                        "image": augment_fn(step_key, batch["image"]),
                        "label": batch["label"],
                    }
                state, m = train_step(state, batch)
                return state, m

            step_keys = jax.random.split(aug_key, steps)
            state, ms = jax.lax.scan(
                body, state, (step_keys, stacked),
                unroll=max(1, self.cfg.train.scan_unroll),
            )
            mean_metrics = jax.tree_util.tree_map(lambda x: jnp.mean(x), ms)
            last_metrics = jax.tree_util.tree_map(lambda x: x[-1], ms)
            return state, mean_metrics, last_metrics

        if val_steps:
            eval_step = self._eval_step
            statics = self.statics
            t_max, t_min = self.cfg.som.t_max, self.cfg.som.t_min

            def val_metrics(state, val_images, val_labels):
                # validate AFTER the epoch at the then-current step's
                # temperature — exactly what _maybe_validate computes on host
                t = som.temperature_schedule(
                    state.step, statics.total_iterations_float, t_max, t_min
                )
                batched = {
                    "image": val_images.reshape(
                        (val_steps, bs) + val_images.shape[1:]
                    ),
                    "label": val_labels.reshape(val_steps, bs),
                }

                def vbody(c, vb):
                    o = eval_step(state.params, vb, t, state.batch_stats)
                    m = {
                        "val/accuracy": jnp.mean(
                            (jnp.argmax(o["logits"], -1) == vb["label"]
                             ).astype(jnp.float32)
                        )
                    }
                    for k_, v_ in o.items():
                        if k_.endswith("_loss"):
                            m[f"val/{k_}"] = v_
                    return c, m

                _, ms = jax.lax.scan(vbody, None, batched)
                return jax.tree_util.tree_map(jnp.mean, ms)

            def epoch_fn_val(carry, key, images, labels, val_images,
                             val_labels):
                def outer(carry, ekey):
                    state, best_acc, best_p, best_bs = carry
                    state, mean_m, last_m = one_epoch(
                        state, ekey, images, labels
                    )
                    vm = val_metrics(state, val_images, val_labels)
                    mean_m = {**mean_m, **vm}
                    last_m = {**last_m, **vm}
                    improved = vm["val/accuracy"] > best_acc
                    best_acc = jnp.where(improved, vm["val/accuracy"],
                                         best_acc)

                    def sel(new, old):
                        return jnp.where(improved, new, old)

                    best_p = jax.tree_util.tree_map(sel, state.params, best_p)
                    if best_bs is not None:
                        best_bs = jax.tree_util.tree_map(
                            sel, state.batch_stats, best_bs
                        )
                    return (state, best_acc, best_p, best_bs), (mean_m, last_m)

                ekeys = jax.random.split(key, n_epochs)
                carry, (means, lasts) = jax.lax.scan(outer, carry, ekeys)
                return carry, means, lasts

            donate = (0,) if self.cfg.train.donate_state else ()
            if os.environ.get("VITSOM_NO_OUT_SHARDINGS"):
                return jax.jit(epoch_fn_val, donate_argnums=donate)
            ss = self._state_sharding
            return jax.jit(
                epoch_fn_val, donate_argnums=donate, out_shardings=(ss, ss, ss)
            )

        def epoch_fn(state, key, images, labels):
            def outer(state, ekey):
                state, mean_m, last_m = one_epoch(state, ekey, images, labels)
                return state, (mean_m, last_m)

            ekeys = jax.random.split(key, n_epochs)
            state, (means, lasts) = jax.lax.scan(outer, state, ekeys)
            return state, means, lasts

        donate = (0,) if self.cfg.train.donate_state else ()
        if os.environ.get("VITSOM_NO_OUT_SHARDINGS"):
            # A/B escape hatch (experiments/ab_dispatch.py): out_shardings
            # pins the cache key but may change XLA's output buffer choices
            return jax.jit(epoch_fn, donate_argnums=donate)
        ss = self._state_sharding
        return jax.jit(epoch_fn, donate_argnums=donate, out_shardings=(ss, ss, ss))

    def _build_chunk_fn(self, k: int):
        """Jitted K-step scan over a stacked [K, bs, ...] batch chunk
        (stream mode). Amortizes the per-dispatch round-trip K-fold."""
        train_step = self._train_step
        mesh = self.mesh

        def chunk_fn(state, batches):
            batches = mesh_lib.shard_stacked_batches(batches, mesh)

            def body(state, batch):
                return train_step(state, batch)

            return jax.lax.scan(body, state, batches)

        ss = self._state_sharding
        return jax.jit(
            chunk_fn,
            donate_argnums=(0,) if self.cfg.train.donate_state else (),
            out_shardings=(ss, ss),
        )

    def _build_split_epoch_fn(self, augment_fn, split: int):
        """Scan-mode epoch as ``ceil(steps/K)`` SEPARATE dispatches
        (``train.scan_splits``): one gather program shuffles + stacks the
        epoch's batches, then ONE reusable jitted K-step chunk program is
        dispatched per slice. Needed because the tunneled v5e worker
        crashes when a single program executes for more than ~3-4 minutes
        (a ~215 s pure-matmul dispatch reproduces it; r5 mobile_vit
        triage) — MobileViT's 224^2 epochs run ~230 s on-device and must
        be sub-divided. Same math as ``_build_epoch_fn`` with
        ``n_epochs=1``: identical gather, augmentation placement and step
        body; only the step-key derivation differs (``fold_in(aug_key,
        step_index)`` instead of one ``split``), which changes the
        realized random stream but not its distribution. Returns a
        composite with the epoch-fn call signature ``(state, key, images,
        labels) -> (state, mean_metrics, last_metrics)``."""
        steps = self.dm.steps_per_epoch
        bs = self.cfg.batch_size
        train_step = self._train_step
        mesh = self.mesh
        K = max(1, steps // max(1, split))
        while steps % K:
            K -= 1
        n_chunks = steps // K
        ss = self._state_sharding
        donate = (0,) if self.cfg.train.donate_state else ()

        @jax.jit
        def gather(key, images, labels):
            flat = images.reshape(images.shape[0], -1)
            perm_key, aug_key = jax.random.split(key)
            perm = jax.random.permutation(perm_key, images.shape[0])[: steps * bs]
            imgs = jnp.take(flat, perm, axis=0).reshape(steps, bs, -1)
            lbls = jnp.take(labels, perm, axis=0).reshape(steps, bs)
            stacked = mesh_lib.shard_stacked_batches(
                {"image": imgs, "label": lbls}, mesh
            )
            return stacked["image"], stacked["label"], aug_key

        sample_shape = tuple(self.dm.train.x.shape[1:])

        def chunk(state, aug_key, imgs, lbls, j):
            ci = jax.lax.dynamic_slice_in_dim(imgs, j * K, K, axis=0)
            cl = jax.lax.dynamic_slice_in_dim(lbls, j * K, K, axis=0)
            step_keys = jax.vmap(
                lambda i: jax.random.fold_in(aug_key, i)
            )(j * K + jnp.arange(K))

            def body(state, xs):
                step_key, img, lbl = xs
                batch = {
                    "image": img.reshape((bs,) + sample_shape),
                    "label": lbl,
                }
                if augment_fn is not None:
                    batch = {
                        "image": augment_fn(step_key, batch["image"]),
                        "label": batch["label"],
                    }
                state, m = train_step(state, batch)
                return state, m

            state, ms = jax.lax.scan(
                body, state, (step_keys, ci, cl),
                unroll=max(1, self.cfg.train.scan_unroll),
            )
            return state, ms

        chunk_jit = jax.jit(chunk, donate_argnums=donate,
                            out_shardings=(ss, ss))

        @jax.jit
        def combine(mss):
            # per-epoch mean over all steps (equal-K chunks) + last step;
            # leaves keep the [n_epochs]=1 leading dim the host loop indexes
            mean_m = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs).mean().reshape(1), *mss
            )
            last_m = jax.tree_util.tree_map(
                lambda x: x[-1].reshape(1), mss[-1]
            )
            return mean_m, last_m

        def epoch_fn(state, key, images, labels):
            imgs, lbls, aug_key = gather(key, images, labels)
            mss = []
            for j in range(n_chunks):
                state, ms = chunk_jit(state, aug_key, imgs, lbls,
                                      jnp.int32(j))
                mss.append(ms)
            mean_m, last_m = combine(tuple(mss))
            return state, mean_m, last_m

        epoch_fn.is_split = True

        def memory_analysis(state, key, images, labels):
            out = jax.eval_shape(gather, key, images, labels)
            return chunk_jit.lower(
                state, out[2], out[0], out[1],
                jax.ShapeDtypeStruct((), jnp.int32),
            ).compile().memory_analysis()

        epoch_fn.memory_analysis = memory_analysis
        return epoch_fn

    # -- public API ----------------------------------------------------------

    def fit(self, progress: bool = True,
            compile_only: Optional[bool] = None) -> Dict[str, Any]:
        cfg = self.cfg
        t_start = time.time()
        best_val_acc = -1.0
        if compile_only is None:
            compile_only = bool(os.environ.get("VITSOM_COMPILE_ONLY"))
        if compile_only and not (self.dm.is_static or self.dm.use_device_augment):
            raise ValueError(
                "compile_only warm mode requires scan mode (static or "
                "device-augment datamodule); stream mode has no single "
                "epoch program to pre-compile"
            )

        if self.dm.is_static or self.dm.use_device_augment:
            if self.dm.uint8_scale_static:
                # raw uint8 across the tunnel (4x smaller host->device
                # transfer), then ONE device-side /255 materialization into
                # an f32 HBM buffer for the epoch gathers. Keeping the
                # dataset u8-resident and fusing /255 into the scan was
                # measured ~0.15 s/epoch SLOWER (u8 1.00 vs f32 0.85
                # aggregate, same window): TPU random-row gathers on 8-bit
                # data lose more than the 4x traffic saving buys.
                if cfg.data.hbm_dtype == "bfloat16":
                    # bf16 storage halves the per-epoch gather traffic;
                    # NOT cached on the split — eval keeps f32 numerics
                    images_u8, labels = self.dm.raw_device_arrays(
                        self.dm.train, mesh=self.mesh
                    )
                    images = jax.jit(
                        lambda x: (x.astype(jnp.float32) / 255.0).astype(
                            jnp.bfloat16
                        )
                    )(images_u8)
                    images_u8 = None
                else:
                    # device_arrays does the u8-over-tunnel upload + device
                    # /255 itself and caches the f32 buffer on the split,
                    # so the post-training clustering eval reuses it
                    # instead of re-transforming + re-uploading the full
                    # split (~263 MB of tunnel time for a 70k split,
                    # INSIDE the timed protocol)
                    images, labels = self.dm.device_arrays(
                        self.dm.train, train_mode=True, mesh=self.mesh
                    )
                aug_fn = None
            elif self.dm.is_static:
                images, labels = self.dm.device_arrays(
                    self.dm.train, train_mode=True, mesh=self.mesh
                )
                aug_fn = None
            else:
                # device-augment scan mode: raw uint8 in HBM, augmentation
                # inside the compiled epoch (data/device_augment.py)
                from vitsom_tpu.data.device_augment import make_device_train_augment

                images, labels = self.dm.raw_device_arrays(
                    self.dm.train, mesh=self.mesh
                )
                if self._device_aug_fn is None:
                    # cached across fit() calls: the epoch programs close
                    # over this fn, so a rebuilt fn would miss the
                    # cross-fit epoch-program cache (pre-exec protocol)
                    self._device_aug_fn = make_device_train_augment(cfg.data)
                aug_fn = self._device_aug_fn
            e_disp = max(1, cfg.train.epochs_per_dispatch)
            scan_splits = max(1, cfg.train.scan_splits)
            if scan_splits > 1:
                # sub-epoch dispatching (see _build_split_epoch_fn): one
                # epoch is already several dispatches, so epoch grouping
                # and the fused val pass don't apply
                e_disp = 1

            # fused on-device validation (see _build_epoch_fn/val_steps):
            # uniform single-process classification with per-epoch eval
            fused_val = (
                scan_splits == 1
                and cfg.train.fused_val
                and cfg.classification
                and self.dm.val is not None
                and jax.process_count() == 1
                and cfg.train.eval_every_n_epochs == 1
                and isinstance(self.dm.val.x, np.ndarray)
                and self.dm.val.x.dtype != object
                and len(self.dm.val) >= cfg.batch_size
            )
            val_args = ()
            val_steps = 0
            if fused_val:
                v_images, v_labels = self.dm.device_arrays(
                    self.dm.val, train_mode=False, mesh=self.mesh
                )
                # drop_last batching — same rows validation_metrics scores
                val_steps = len(self.dm.val) // cfg.batch_size
                n_keep = val_steps * cfg.batch_size
                val_args = (v_images[:n_keep], v_labels[:n_keep])
                # carry: best acc starts below any real accuracy so epoch 1
                # always installs itself; best params start as fresh zeros
                # buffers (NOT an alias of state.params — the carry is
                # donated and aliased donation is undefined)
                zeros = jax.jit(
                    lambda t: jax.tree_util.tree_map(jnp.zeros_like, t),
                    out_shardings=self._state_sharding,
                )
                carry = (
                    self.state,
                    mesh_lib.put_replicated(
                        jnp.asarray(-1.0, jnp.float32), self.mesh
                    ),
                    zeros(self.state.params),
                    zeros(self.state.batch_stats)
                    if self.state.batch_stats is not None
                    else None,
                )
            def get_epoch_fn(n):
                # instance-level cache (see __init__._epoch_fn_cache): a
                # timed fit() after fit(compile_only=True) + reset_state()
                # must dispatch the SAME warm executables
                k = (n, val_steps, aug_fn is not None, scan_splits)
                if k not in self._epoch_fn_cache:
                    if scan_splits > 1:
                        self._epoch_fn_cache[k] = self._build_split_epoch_fn(
                            augment_fn=aug_fn, split=scan_splits
                        )
                    else:
                        self._epoch_fn_cache[k] = self._build_epoch_fn(
                            augment_fn=aug_fn, n_epochs=n, val_steps=val_steps
                        )
                return self._epoch_fn_cache[k]

            # rbg (XLA RngBitGenerator -> TPU hardware RNG) for the in-scan
            # RNG stream (epoch shuffle perms + the on-device augmentation
            # stack): threefry mask/crop/erase bit generation was profiled at
            # ~15% of the cls step as fused VPU work attributed to the key
            # split (trainer.py step_keys) plus ~13% inside device_augment —
            # see steps.dropout_base_key for the same rationale on dropout.
            key = jax.random.key(cfg.train.seed + 1000 * self.run_id, impl="rbg")
            epoch_images = self.dm.steps_per_epoch * cfg.batch_size
            n_chips = max(1, self.mesh.devices.size)
            # Deferred-pull mode: when nothing on the host needs per-dispatch
            # values (no validation/best-checkpoint monitoring, no image
            # logging, no profiling — i.e. the clustering benchmark
            # protocol), enqueue EVERY dispatch back-to-back and pull all
            # metrics in ONE batched transfer at the end. Each blocking
            # to_host costs a tunnel RTT plus a full pipeline drain
            # (dispatch -> device idle -> host -> dispatch); streaming the
            # dispatches lets the device run the whole protocol gap-free.
            # Per-epoch metric logs are unchanged (steps reconstructed from
            # epoch indices); the per-epoch throughput tag becomes the
            # run-level mean (per-dispatch walls don't exist un-fenced).
            defer = (
                cfg.train.profile_epoch < 0
                and (
                    fused_val
                    or not (cfg.classification and self.dm.val is not None)
                )
                and not (
                    cfg.train.log_images_every_n_epochs > 0
                    and cfg.model_arch == "desom"
                )
            )
            pending = []  # (start_epoch, n, mean_ms device tree)
            dispatch_host_s = []  # host-side time per dispatch (compile shows
            # up in the first; steady entries ~0 when deferred)
            if compile_only:
                # Scoreboard warm mode (run_family_bench.warm_one): AOT-
                # compile the exact epoch program(s) the timed run will
                # dispatch — populating the persistent XLA compile cache —
                # and skip training. A warm is then ~one compile instead of
                # a full 500-epoch run (vit r3: 1744 s); the caller still
                # runs the post-fit eval path, warming those programs too.
                # The compile alone is NOT enough: this backend's first 2-3
                # EXECUTIONS of a fresh executable run 10-20x slow
                # (executable upload/warm-up, server-side per program —
                # CLAUDE.md), so a compile-only warm still leaves the timed
                # run's first dispatch paying it (cluster_40 r4 queue9:
                # 379.8 s first dispatch vs 25.9 s steady behind a
                # *completed* compile-only warm). Execute each program 3x
                # here so the timed run opens at steady state, matching the
                # reference's precompiled+resident CUDA kernels.
                sizes = {min(e_disp, cfg.total_epochs)}
                if cfg.total_epochs % e_disp:
                    sizes.add(cfg.total_epochs % e_disp)
                for n in sorted(sizes):
                    fn = get_epoch_fn(n)
                    key, sub = jax.random.split(key)
                    args = (
                        (carry, sub, images, labels, *val_args)
                        if fused_val
                        else (self.state, sub, images, labels)
                    )
                    t_c = time.time()
                    if getattr(fn, "is_split", False):
                        # composite (gather + chunk + combine programs):
                        # the first call below compiles all three; there is
                        # no single .lower target
                        print(
                            "# compile-only: split-epoch composite — "
                            "compiling via first warm exec",
                            flush=True,
                        )
                    else:
                        fn.lower(*args).compile()
                        print(
                            f"# compile-only: n={n} epoch program compiled+"
                            f"cached in {time.time() - t_c:.1f}s",
                            flush=True,
                        )
                    for i in range(3):
                        key, sub = jax.random.split(key)
                        t_e = time.time()
                        if fused_val:
                            carry, _, _ = fn(carry, sub, images, labels,
                                             *val_args)
                            self.state = carry[0]
                        else:
                            self.state, _, _ = fn(
                                self.state, sub, images, labels
                            )
                        jax.device_get(self.state.step)
                        print(
                            f"# compile-only: n={n} warm exec {i + 1}/3 in "
                            f"{time.time() - t_e:.1f}s",
                            flush=True,
                        )
            t_loop = time.time()
            epoch = 0
            while not compile_only and epoch < cfg.total_epochs:
                n = min(e_disp, cfg.total_epochs - epoch)
                epoch_fn = get_epoch_fn(n)
                key, sub = jax.random.split(key)
                t_e = time.time()
                if defer:
                    if fused_val:
                        carry, mean_ms, _ = epoch_fn(
                            carry, sub, images, labels, *val_args
                        )
                        self.state = carry[0]
                    else:
                        self.state, mean_ms, _ = epoch_fn(
                            self.state, sub, images, labels
                        )
                    # FENCE (one ~65 ms scalar pull) every Nth dispatch:
                    # measured on the tunneled backend, un-fenced
                    # back-to-back dispatches run ~3x slower per epoch
                    # (2.99 s vs 1.01 s same window) — the stream scheduler
                    # degrades with deep execution queues. N > 1 amortizes
                    # the RTT while keeping the queue bounded. Metrics stay
                    # deferred to one end-of-run pull.
                    if (
                        len(pending) % max(1, cfg.train.fence_every_n_dispatches)
                        == 0
                    ):
                        jax.device_get(self.state.step)
                    dispatch_host_s.append(time.time() - t_e)
                    pending.append((epoch, n, mean_ms))
                    epoch += n
                    continue
                with self._maybe_profile(epoch):
                    if fused_val:
                        carry, mean_ms, last_ms = epoch_fn(
                            carry, sub, images, labels, *val_args
                        )
                        self.state = carry[0]
                    else:
                        self.state, mean_ms, last_ms = epoch_fn(
                            self.state, sub, images, labels
                        )
                    jax.block_until_ready(self.state.step)
                # ONE batched device->host pull per dispatch: each individual
                # scalar fetch costs ~65ms RTT on tunneled TPU backends, so
                # per-metric float() calls would dominate the epoch itself.
                host = dist_lib.to_host({"m": mean_ms, "step": self.state.step})
                dt_e = time.time() - t_e
                dispatch_host_s.append(dt_e)
                end_step = int(host["step"])
                ips = n * epoch_images / dt_e / n_chips
                for i in range(n):
                    scalars = {k: float(v[i]) for k, v in host["m"].items()}
                    scalars["perf/images_per_sec_per_chip"] = ips
                    self.logger.log_scalars(
                        scalars,
                        step=end_step - (n - 1 - i) * self.dm.steps_per_epoch,
                    )
                epoch += n
                # images/validation at dispatch boundaries (every epoch when
                # epochs_per_dispatch == 1, the default)
                self._maybe_log_images(epoch - 1, images, end_step)
                if not fused_val:
                    best_val_acc = self._maybe_validate(epoch - 1, best_val_acc)
            if pending:
                # single fence + transfer for the whole run's metrics
                host = dist_lib.to_host(
                    {"m": [p[2] for p in pending], "step": self.state.step}
                )
                dt_loop = time.time() - t_loop
                run_epochs = sum(p[1] for p in pending)
                ips = run_epochs * epoch_images / dt_loop / n_chips
                for (start_e, n, _), m in zip(pending, host["m"]):
                    for i in range(n):
                        scalars = {k: float(v[i]) for k, v in m.items()}
                        scalars["perf/images_per_sec_per_chip"] = ips
                        self.logger.log_scalars(
                            scalars,
                            step=(start_e + i + 1) * self.dm.steps_per_epoch,
                        )
            jax.block_until_ready(self.state.params)
            # install the static memory-analysis probe (Trainer.memory_
            # analysis): re-lowering the SAME epoch program hits both the jit
            # trace cache and the persistent XLA compile cache, so the probe
            # costs seconds, not a fresh 30-190 s tunnel compile — and it runs
            # only when explicitly asked, after the timed region
            _probe_n = min(e_disp, cfg.total_epochs)
            _probe_args = (
                (carry, sub, images, labels, *val_args)
                if fused_val
                else (self.state, sub, images, labels)
            )

            def _memory_probe(n=_probe_n, args=_probe_args):
                fn = get_epoch_fn(n)
                if getattr(fn, "is_split", False):
                    # chunk program = the big one in split mode
                    return fn.memory_analysis(*args)
                return fn.lower(*args).compile().memory_analysis()

            self._memory_probe = _memory_probe
            if fused_val:
                # one pull for the tracked best accuracy; the best-epoch
                # params land on disk as the same "best" checkpoint artifact
                # the save-on-improvement host path writes
                best_val_acc = float(dist_lib.to_host(carry[1]))
                self.save_checkpoint(
                    tag="best", params=carry[2], batch_stats=carry[3]
                )
            if os.environ.get("VITSOM_TIMING") and dispatch_host_s:
                import sys as _sys

                head = ", ".join(f"{t:.2f}" for t in dispatch_host_s[:4])
                print(
                    f"# fit timing: {len(dispatch_host_s)} dispatches, "
                    f"host-side first4=[{head}]s "
                    f"sum={sum(dispatch_host_s):.2f}s "
                    f"loop_wall={time.time() - t_loop:.2f}s "
                    f"(deferred={bool(pending)})",
                    file=_sys.stderr,
                )
        else:
            # stream mode: K augmented host batches per device dispatch — a
            # per-step dispatch costs a tunnel RTT (~90ms), which would cap
            # throughput at ~11 steps/s regardless of compute. Chunks are
            # stacked on HOST and cross the tunnel once (chunked_device_
            # prefetch); the ragged epoch tail gets ONE extra chunk_fn
            # specialized to its length (constant across epochs -> compiled
            # once), never a per-step dispatch fallback.
            k = max(1, cfg.train.steps_per_dispatch)
            chunk_fns = {k: self._build_chunk_fn(k)}
            step_in_epoch_log = cfg.train.log_every_n_steps
            for epoch in range(cfg.total_epochs):
                it = chunked_device_prefetch(
                    self.dm.train_batches(
                        epoch, seed=cfg.train.seed + 1000 * self.run_id
                    ),
                    k,
                    mesh=self.mesh,
                )
                accum = []
                steps_since_log = 0
                for chunk, n in it:
                    fn = chunk_fns.get(n)
                    if fn is None:
                        fn = chunk_fns[n] = self._build_chunk_fn(n)
                    self.state, ms = fn(self.state, chunk)
                    accum.append(ms)  # [n]-leaved metric stacks
                    steps_since_log += n
                    if steps_since_log >= step_in_epoch_log:
                        steps_since_log = 0
                        host = dist_lib.to_host(
                            {"m": accum[-1], "step": self.state.step}
                        )
                        self.logger.log_scalars(
                            {k_: float(v[-1]) for k_, v in host["m"].items()},
                            step=int(host["step"]),
                        )

                if accum:
                    stacked = jax.tree_util.tree_map(
                        lambda *xs: np.concatenate(xs), *dist_lib.to_host(accum)
                    )
                    mean_m = {k_: float(np.mean(v)) for k_, v in stacked.items()}
                    self._log_epoch(epoch, mean_m)
                best_val_acc = self._maybe_validate(epoch, best_val_acc)
            jax.block_until_ready(self.state.params)

        wall = time.time() - t_start
        self._capture_memory()
        n_images = self.statics.total_steps * cfg.batch_size
        result = {
            "wall_time_s": wall,
            "images_per_sec_per_chip": n_images / wall / max(1, len(self.mesh.devices.flat)),
            "peak_memory_gb": self.peak_memory_gb,
            "memory_metric": self.memory_metric,
            "best_val_accuracy": best_val_acc,
            "final_step": int(dist_lib.to_host(self.state.step)),
        }
        mem_label = (
            "peak mem" if self.memory_metric == "peak_bytes_in_use"
            else "live mem (lower bound)"
        )
        print(
            f"Training done in {wall:.2f}s — "
            f"{result['images_per_sec_per_chip']:.0f} img/s/chip, "
            f"{mem_label} {self.peak_memory_gb:.3f} GB"
        )
        return result

    # -- validation / eval ---------------------------------------------------

    def current_temperature(self):
        # to_host first: eager math on a global (multi-host) step array fails
        return som.temperature_schedule(
            dist_lib.to_host(self.state.step),
            self.statics.total_iterations_float,
            self.cfg.som.t_max,
            self.cfg.som.t_min,
        )

    def eval_fn(self):
        """The jitted eval step — a STABLE object, so the eval-scan cache in
        ``eval/evaluate.py`` hits across epochs. batch_stats (BatchNorm
        models) is threaded as a traced argument via the drivers'
        ``batch_stats=`` parameter, never closure-bound (a fresh closure per
        eval used to recompile the whole eval scan each epoch)."""
        return self._jit_eval

    def _maybe_validate(self, epoch: int, best_val_acc: float) -> float:
        cfg = self.cfg
        if not cfg.classification or self.dm.val is None:
            return best_val_acc
        if (epoch + 1) % cfg.train.eval_every_n_epochs != 0:
            return best_val_acc
        scalars = eval_lib.validation_metrics(
            self.eval_fn(), self.state.params, self.dm, split=self.dm.val,
            temperature=self.current_temperature(),
            batch_stats=self.state.batch_stats,
        )
        acc = scalars["val/accuracy"]
        self.logger.log_scalars(scalars, step=int(dist_lib.to_host(self.state.step)))
        if acc > best_val_acc:
            best_val_acc = acc
            self.save_checkpoint(tag="best")
        return best_val_acc

    def evaluate(self) -> Dict[str, float]:
        """Final evaluation matching the reference protocol: clustering on
        the train (concat) set from the last state; classification on the
        test loader from the in-memory model (``train_vit_som.py:100-112``)."""
        cfg = self.cfg
        if cfg.classification:
            # release the cached per-epoch VAL device buffer before the
            # test split materializes: at input_size=224 each f32 split is
            # ~6 GB and holding both OOM'd the v5e during the mobile_vit
            # final eval (r5); the val cache is not used past this point
            if self.dm.val is not None and hasattr(self.dm.val, "_device_cache"):
                self.dm.val._device_cache.clear()
            acc, prec, rec, f1, dt = eval_lib.evaluate_classification(
                self.eval_fn(), self.state.params, self.dm,
                temperature=self.current_temperature(),
                batch_stats=self.state.batch_stats,
            )
            return {"accuracy": acc, "precision": prec, "recall": rec, "f1": f1,
                    "inference_time": dt}
        p, n, dt = eval_lib.evaluate_clustering(
            self.eval_fn(), self.state.params, self.dm, self.current_temperature(),
            batch_stats=self.state.batch_stats,
        )
        return {"purity": p, "nmi": n, "inference_time": dt}

    # -- checkpointing ---------------------------------------------------------

    def checkpoint_dir(self, tag: str) -> str:
        return os.path.abspath(
            os.path.join(
                self.cfg.train.checkpoint_dir,
                self.cfg.model_arch,
                f"{self.cfg.data.dataset}_run{self.run_id}_{tag}",
            )
        )

    def save_checkpoint(self, tag: str = "last", params=None, batch_stats=None):
        """``params``/``batch_stats`` override the live state's (used by the
        fused-val path to persist the tracked best-epoch weights); opt_state
        and step always come from the live state."""
        import orbax.checkpoint as ocp

        path = self.checkpoint_dir(tag)
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": params if params is not None else self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        if batch_stats is None:
            batch_stats = self.state.batch_stats
        if batch_stats is not None:
            payload["batch_stats"] = batch_stats
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        # Embed the full config so the checkpoint is self-contained
        # (reference ``save_hyperparameters``, ``models/vit_som.py:26``):
        # eval_checkpoint.py can rebuild the model from the checkpoint alone,
        # and restore_checkpoint fails loudly on a config mismatch.
        if dist_lib.is_primary():
            save_checkpoint_config(path, self.cfg)

    def restore_checkpoint(self, tag: str = "last", path: Optional[str] = None):
        import orbax.checkpoint as ocp

        path = path or self.checkpoint_dir(tag)
        check_checkpoint_config(path, self.cfg)
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        if self.state.batch_stats is not None:
            target["batch_stats"] = self.state.batch_stats
        restored = ckptr.restore(path, target)
        # re-place on the replicated mesh sharding (orbax restores to the
        # default device; under a mesh the state must be device-replicated)
        restored = mesh_lib.put_replicated(restored, self.mesh)
        self.state = steps_lib.TrainState(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            batch_stats=restored.get("batch_stats"),
        )

    # -- internals ---------------------------------------------------------

    def _maybe_profile(self, epoch: int):
        """``jax.profiler`` trace of one epoch when ``train.profile_epoch``
        selects it (SURVEY.md §5: the reference has no tracing beyond
        ``time.time()``; here a TensorBoard-viewable device trace is one
        config flag away)."""
        import contextlib

        if self.cfg.train.profile_epoch >= 0 and epoch == self.cfg.train.profile_epoch:
            trace_dir = os.path.join(
                self.cfg.train.log_dir, self.cfg.model_arch,
                self.cfg.data.dataset, f"run_{self.run_id}", "profile",
            )
            return jax.profiler.trace(trace_dir)
        return contextlib.nullcontext()

    def _maybe_log_images(self, epoch: int, images, step: int):
        """DESOM input/reconstruction/decoded-prototype grids to TensorBoard
        (reference ``models/desom.py:160-174``), every
        ``train.log_images_every_n_epochs`` epochs."""
        every = self.cfg.train.log_images_every_n_epochs
        if every <= 0 or (epoch + 1) % every != 0:
            return
        if self.cfg.model_arch != "desom":
            return
        cfg = self.cfg
        s, c = cfg.data.input_size, cfg.data.num_channels
        n_show = min(16, images.shape[0])
        x = images[:n_show].reshape(n_show, -1)
        params = self.state.params

        if self._jit_decode_images is None:
            # build once — a fresh jit wrapper per call would recompile on
            # every logging epoch (30-190s each on tunneled backends)
            def decode_batch(params, x):
                _, z, _, _, decoded = self.model.apply(
                    {"params": params}, x, method="forward_with_recon"
                )
                protos = self.model.apply(
                    {"params": params}, params["prototypes"], method="decode"
                )
                return decoded, protos

            self._jit_decode_images = jax.jit(decode_batch)

        decoded, protos = jax.device_get(self._jit_decode_images(params, x))

        def grid(flat, rows, cols):
            imgs = np.clip(flat.reshape(-1, s, s, c), 0.0, 1.0)[: rows * cols]
            canvas = np.zeros((rows * s, cols * s, c), np.float32)
            for i in range(min(len(imgs), rows * cols)):
                r, cl = divmod(i, cols)
                canvas[r * s : (r + 1) * s, cl * s : (cl + 1) * s] = imgs[i]
            return canvas

        self.logger.log_image("images/input", grid(np.asarray(x), 4, 4), step)
        self.logger.log_image("images/reconstruction", grid(decoded, 4, 4), step)
        rows, cols = cfg.som.map_size
        self.logger.log_image(
            "images/decoded_prototypes", grid(protos, rows, cols), step
        )

    def _log_epoch(self, epoch: int, mean_metrics):
        host = dist_lib.to_host({"m": mean_metrics, "step": self.state.step})
        scalars = {f"{k}": float(v) for k, v in host["m"].items()}
        self.logger.log_scalars(scalars, step=int(host["step"]))

    def _capture_memory(self):
        """Device memory telemetry (reference prints
        ``torch.cuda.max_memory_allocated``, ``models/vit_som.py:169``).
        Prefers the runtime's peak counter; falls back to summed live device
        arrays on backends whose memory_stats() is None (e.g. tunneled TPU).
        The fallback is a LOWER BOUND on the true peak (freed scratch and
        compiler temporaries are invisible to it), so it is labeled
        ``memory_metric='live_bytes_lower_bound'`` — never compare it
        against a true peak counter as if it were one."""
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "peak_bytes_in_use" in stats:
                self.peak_memory_gb = stats["peak_bytes_in_use"] / 1e9
                self.memory_metric = "peak_bytes_in_use"
                return
        except Exception:
            pass
        try:
            live = sum(
                a.size * a.dtype.itemsize
                for a in jax.live_arrays()
                if a.is_fully_addressable
            )
            self.peak_memory_gb = live / 1e9
            self.memory_metric = "live_bytes_lower_bound"
        except Exception:
            pass

    def memory_analysis(self) -> Optional[Dict[str, Any]]:
        """Static device-memory accounting of the main training program via
        ahead-of-time compile analysis (``lower().compile()
        .memory_analysis()``).

        The live-arrays fallback above cannot see freed scratch, so none of
        the reference's published peak-memory rows
        (``/root/reference/README.md:101-109``, CUDA
        ``max_memory_allocated``) were comparable. This reports XLA's
        compile-time buffer assignment for the epoch program — argument +
        output + temp bytes, with donation-aliased bytes removed — an upper
        bound on what the program can touch at once, comparable across
        configs. Only available after a scan-mode ``fit()`` (all scoreboard
        benchmarks); stream mode returns None."""
        if self._memory_probe is None:
            return None
        try:
            ma = self._memory_probe()
        except Exception as e:  # backend without AOT analysis: honest miss
            return {"error": f"{type(e).__name__}: {e}"}
        out: Dict[str, Any] = {}
        for k in (
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "temp_size_in_bytes",
            "alias_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(ma, k, None)
            if v is not None:
                out[k] = int(v)
        needed = {"argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes"}
        if needed <= out.keys():
            # donated inputs alias outputs; counting both would double-count
            peak = (
                out["argument_size_in_bytes"]
                + out["output_size_in_bytes"]
                + out["temp_size_in_bytes"]
                - out.get("alias_size_in_bytes", 0)
            )
            out["peak_bytes_estimate"] = int(peak)
            out["peak_gb_estimate"] = round(peak / 1e9, 3)
        return out or {"error": "memory_analysis returned no known fields"}
