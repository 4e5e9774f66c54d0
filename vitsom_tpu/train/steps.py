"""Jitted train/eval steps for every model family.

The reference delegates its training loop to PyTorch-Lightning
(``/root/reference/models/vit_som.py:80-105``, ``models/desom.py:56-75``);
here the entire step — forward, schedules, loss, backward, optimizer — is a
single pure function compiled once by XLA and executed device-resident, with
the global step counter living in the TrainState. No Python runs per step.

Loss recipes replicated exactly:
- vit_som clustering: L1(recon, x) + gamma(t) * som_loss, gamma ramping
  linearly over the first half of total steps (``models/vit_som.py:89-101``)
- vit_som classification: CE(label_smoothing) + gamma(t) * som_loss
  (``models/vit_som.py:94-98``)
- desom clustering: L1(dec(z), x_flat) + gamma * som_loss (constant gamma,
  ``models/desom.py:133-158``)
- desom classification: CE + gamma * (som_loss + recon_loss)
- vit/swin/deit/mobile_vit: CE (+ smoothing per config)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vitsom_tpu.config import Config
from vitsom_tpu.som import layer as som
from vitsom_tpu.train import schedules


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Optional[Any] = None


def dropout_base_key(seed: int) -> jax.Array:
    """Base key for the per-step dropout mask streams.

    Uses the ``rbg`` PRNG (XLA RngBitGenerator — the TPU hardware RNG)
    instead of JAX's default threefry: threefry costs ~dozens of VPU ops
    per mask bit and XLA fuses that generation into the adjacent dot
    fusions — profiled on the DeiT CIFAR step (12 blocks x 4 dropout
    sites at p=0.1) at ~196 us for dot+Adam fusions that run at 16 us
    without fused RNG. Dropout needs statistically independent mask
    bits, not a counter-cryptographic stream, and stream-level parity
    with the reference never existed (torch GPU dropout draws from
    cuRAND Philox, a different sequence; reference ``models/deit.py:46``
    relies on torch semantics only for the rate)."""
    return jax.random.key(seed, impl="rbg")


@dataclasses.dataclass(frozen=True)
class StepStatics:
    """Compile-time constants derived from dataset size + config."""

    steps_per_epoch: int  # floor(n_train / batch) — drop_last semantics
    total_epochs: int
    dataset_len: int
    batch_size: int

    @property
    def total_steps(self) -> int:
        return self.steps_per_epoch * self.total_epochs

    @property
    def ramp_up_end_step(self) -> int:
        # estimated_stepping_batches // 2 (``models/vit_som.py:89``)
        return self.total_steps // 2

    @property
    def total_iterations_float(self) -> float:
        # temperature denominator (``models/som_layer.py:131``)
        return som.total_iterations(self.dataset_len, self.batch_size, self.total_epochs)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.0):
    """torch nn.CrossEntropyLoss(label_smoothing=s) with mean reduction."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes)
    if smoothing > 0.0:
        one_hot = optax.smooth_labels(one_hot, smoothing)
    return jnp.mean(optax.softmax_cross_entropy(logits, one_hot))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


# ---------------------------------------------------------------------------
# ViT-SOM
# ---------------------------------------------------------------------------


def make_vit_som_train_step(
    cfg: Config,
    model,
    tx: optax.GradientTransformation,
    statics: StepStatics,
    lr_schedule: Callable,
    mesh=None,
):
    grid_d2 = jnp.asarray(som.grid_sq_distances(cfg.som.map_size, cfg.som.topology))
    total_iters = statics.total_iterations_float
    ramp_end = statics.ramp_up_end_step
    classification = cfg.classification
    smoothing = cfg.optimizer.smoothing
    gamma = cfg.gamma

    # fused Pallas SOM path: distances + BMU + weights + loss in one kernel
    # (manhattan stays on XLA — only DESOM configs use it)
    use_fused = cfg.train.use_pallas_som and cfg.som.distance_fcn in (
        "euclidean",
        "cosine",
    )
    if use_fused:
        from vitsom_tpu.ops import som_pallas

        if mesh is not None and mesh.devices.size > 1:
            # DP: shard_map the kernel over the batch axis (pallas_call has
            # no SPMD rule; without this XLA would all-gather its operands)
            fused_som = som_pallas.make_fused_som_sharded(
                cfg.som.map_size, cfg.som.topology, cfg.som.distance_fcn, mesh
            )
        else:
            fused_som = som_pallas.make_fused_som(
                cfg.som.map_size, cfg.som.topology, cfg.som.distance_fcn
            )

    def loss_fn(params, batch, step):
        x, y = batch["image"], batch["label"]
        temperature = som.temperature_schedule(
            step, total_iters, cfg.som.t_max, cfg.som.t_min
        )
        if use_fused:
            cls_tok, recon, logits, z = model.apply(
                {"params": params}, x, method="features"
            )
            som_l, bmu_idx, _ = fused_som(z, params["prototypes"], temperature)
        else:
            cls_tok, recon, logits, distances, bmu_idx = model.apply(
                {"params": params}, x
            )
            weights = som.neighborhood_weights(bmu_idx, grid_d2, temperature)
            som_l = som.som_loss(jax.lax.stop_gradient(weights), distances)
        cur_gamma = schedules.gamma_ramp(step, gamma, ramp_end)

        if classification:
            cls_l = cross_entropy(logits, y, smoothing)
            total = cls_l + cur_gamma * som_l
            metrics = {"train/cls_loss": cls_l}
        else:
            recon_l = l1_loss(recon, x)
            total = recon_l + cur_gamma * som_l
            metrics = {"train/recon_loss": recon_l}
        metrics.update(
            {
                "train/som_loss": som_l,
                "train/total_loss": total,
                "hp/gamma": cur_gamma,
                "hp/temperature": temperature,
            }
        )
        return total, metrics

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, state.step
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["hp/lr"] = lr_schedule(state.step)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, metrics

    return train_step


def make_vit_som_eval_step(cfg: Config, model):
    """Returns (bmu, logits-or-None, per-batch val losses) for val/test batches.

    Loss tags replicate the reference's ``validation_step``
    (``/root/reference/models/vit_som.py:107-125``): the val total loss uses
    the FULL (un-ramped) gamma, and cls_loss keeps the label smoothing."""
    grid_d2 = jnp.asarray(som.grid_sq_distances(cfg.som.map_size, cfg.som.topology))
    gamma = cfg.gamma
    smoothing = cfg.optimizer.smoothing

    def eval_step(params, batch, temperature, batch_stats=None):
        x = batch["image"]
        cls_tok, recon, logits, distances, bmu_idx = model.apply({"params": params}, x)
        weights = som.neighborhood_weights(bmu_idx, grid_d2, temperature)
        som_l = som.som_loss(weights, distances)
        recon_l = l1_loss(recon, x)
        out = {
            "bmu": bmu_idx,
            "logits": logits if cfg.classification else jnp.zeros((x.shape[0], 1)),
            "som_loss": som_l,
            "recon_loss": recon_l,
        }
        if cfg.classification:
            cls_l = cross_entropy(logits, batch["label"], smoothing)
            out["cls_loss"] = cls_l
            out["total_loss"] = cls_l + gamma * som_l
        else:
            out["total_loss"] = recon_l + gamma * som_l
        return out

    return eval_step


# ---------------------------------------------------------------------------
# DESOM
# ---------------------------------------------------------------------------


def make_desom_train_step(
    cfg: Config,
    model,
    tx: optax.GradientTransformation,
    statics: StepStatics,
    lr_schedule: Callable,
):
    grid_d2 = jnp.asarray(som.grid_sq_distances(cfg.som.map_size, cfg.som.topology))
    total_iters = statics.total_iterations_float
    classification = cfg.classification
    gamma = cfg.gamma
    has_bn = cfg.ae.batch_norm

    def loss_fn(params, batch_stats, batch, step):
        x, y = batch["image"], batch["label"]
        x_flat = x.reshape(x.shape[0], -1)
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
            (logits, z, distances, bmu_idx, decoded), mutated = model.apply(
                variables,
                x_flat,
                train=True,
                mutable=["batch_stats"],
                method="forward_with_recon",
            )
            new_bs = mutated["batch_stats"]
        else:
            logits, z, distances, bmu_idx, decoded = model.apply(
                variables, x_flat, method="forward_with_recon"
            )
            new_bs = batch_stats

        temperature = som.temperature_schedule(
            step, total_iters, cfg.som.t_max, cfg.som.t_min
        )
        weights = som.neighborhood_weights(bmu_idx, grid_d2, temperature)
        som_l = som.som_loss(jax.lax.stop_gradient(weights), distances)
        recon_l = l1_loss(decoded, x_flat)

        if classification:
            cls_l = cross_entropy(logits, y)
            total = cls_l + gamma * (som_l + recon_l)
            metrics = {"train/cls_loss": cls_l}
        else:
            total = recon_l + gamma * som_l
            metrics = {}
        metrics.update(
            {
                "train/recon_loss": recon_l,
                "train/som_loss": som_l,
                "train/total_loss": total,
                "hp/temperature": temperature,
            }
        )
        return total, (metrics, new_bs)

    def train_step(state: TrainState, batch):
        (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, state.step
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["hp/lr"] = lr_schedule(state.step)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, batch_stats=new_bs
        )
        return new_state, metrics

    return train_step


def make_desom_eval_step(cfg: Config, model):
    has_bn = cfg.ae.batch_norm

    def eval_step(params, batch, temperature, batch_stats=None):
        x = batch["image"]
        x_flat = x.reshape(x.shape[0], -1)
        variables = {"params": params}
        if has_bn and batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits, z, distances, bmu_idx = model.apply(variables, x_flat)
        return {
            "bmu": bmu_idx,
            "logits": logits if cfg.classification else jnp.zeros((x.shape[0], 1)),
            "latent": z,
        }

    return eval_step


# ---------------------------------------------------------------------------
# plain classifiers (vit / swin / deit / mobile_vit)
# ---------------------------------------------------------------------------


def make_classifier_train_step(
    cfg: Config,
    model,
    tx: optax.GradientTransformation,
    lr_schedule: Callable,
    smoothing: float,
    loss_name: str = "train/cls_loss",
    has_batch_stats: bool = False,
):
    # swin/mobile_vit use stochastic-depth / dropout RNG during training
    stochastic = cfg.model_arch in ("swin", "deit", "mobile_vit")
    base_key = dropout_base_key(cfg.train.seed + 7919)

    def loss_fn(params, batch_stats, batch, step):
        variables = {"params": params}
        kwargs = {}
        if stochastic:
            kwargs = dict(
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(base_key, step)},
            )
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
            logits, mutated = model.apply(
                variables, batch["image"], mutable=["batch_stats"], **kwargs
            )
            new_bs = mutated["batch_stats"]
        else:
            logits = model.apply(variables, batch["image"], **kwargs)
            new_bs = batch_stats
        loss = cross_entropy(logits, batch["label"], smoothing)
        return loss, ({loss_name: loss}, new_bs)

    def train_step(state: TrainState, batch):
        (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, state.step
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["hp/lr"] = lr_schedule(state.step)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                batch_stats=new_bs,
            ),
            metrics,
        )

    return train_step


def make_classifier_eval_step(cfg: Config, model, has_batch_stats: bool = False):
    """Baseline classifier eval; ``cls_loss`` matches the reference's
    per-epoch ``val/cls_loss`` (all four baselines log it, e.g.
    ``/root/reference/models/swin.py:52``, ``models/vit.py:299``). Smoothing:
    swin/mobile_vit validate with their smoothed train loss_fn; vit uses plain
    CE (``models/vit.py:280``) and deit's ``val_loss_fn`` is plain CE too
    (``models/deit.py:54``)."""
    smoothing = (
        cfg.optimizer.smoothing if cfg.model_arch not in ("vit", "deit") else 0.0
    )

    def eval_step(params, batch, temperature=None, batch_stats=None):
        variables = {"params": params}
        if has_batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, batch["image"])
        return {
            "logits": logits,
            "bmu": jnp.zeros((logits.shape[0],), jnp.int32),
            "cls_loss": cross_entropy(logits, batch["label"], smoothing),
        }

    return eval_step
