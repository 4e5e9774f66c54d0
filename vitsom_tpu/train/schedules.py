"""Learning-rate / gamma / temperature schedules.

Pure functions of the global step, designed to live inside the jitted train
step (no Python in the loop). Each replicates a schedule from the reference:

- ``warmup_cosine_epoch_factor`` — the LambdaLR lambda of
  ``/root/reference/models/vit_som.py:160`` (also ``models/vit.py:333``),
  stepped per *epoch* exactly as PyTorch-Lightning does.
- ``swin_warmup_cosine_factor`` — ``/root/reference/models/swin.py:75-85``.
- ``cosine_annealing_lr`` — torch CosineAnnealingLR used by DeiT/MobileViT
  (``models/deit.py:91-94``, ``models/mobile_vit.py:65-69``).
- ``gamma_ramp`` — the self-construction-loss ramp of
  ``models/vit_som.py:89-90``: linear 0 -> gamma over the first half of
  total steps.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def warmup_cosine_epoch_factor(
    epoch: jnp.ndarray, warmup_epochs: int, total_epochs: int, min_lr_factor: float
) -> jnp.ndarray:
    """LambdaLR factor: max(min_lr, min((e+1)/(warmup+1e-8), 0.5(cos(e/total*pi)+1))).

    Note the reference quirk: ``min_lr`` from the config is used as a
    *multiplicative factor floor*, not an absolute LR
    (``models/vit_som.py:160``). Replicated as-is.
    """
    e = epoch.astype(jnp.float32)
    warm = (e + 1.0) / (warmup_epochs + 1e-8)
    cos = 0.5 * (jnp.cos(e / total_epochs * math.pi) + 1.0)
    return jnp.maximum(min_lr_factor, jnp.minimum(warm, cos))


def swin_warmup_cosine_factor(
    epoch: jnp.ndarray, warmup_epochs: int, total_epochs: int, min_lr: float, base_lr: float
) -> jnp.ndarray:
    """Swin LambdaLR factor (``models/swin.py:75-85``): linear warmup then
    cosine decay to an absolute ``min_lr`` floor expressed as a ratio."""
    e = epoch.astype(jnp.float32)
    warm = e / max(1, warmup_epochs)
    progress = (e - warmup_epochs) / max(1, total_epochs - warmup_epochs)
    cosine_decay = 0.5 * (1.0 + jnp.cos(math.pi * progress))
    min_ratio = min_lr / base_lr
    decay = (1.0 - min_ratio) * cosine_decay + min_ratio
    return jnp.where(e < warmup_epochs, warm, decay)


def cosine_annealing_lr(
    epoch: jnp.ndarray, base_lr: float, total_epochs: int, eta_min: float = 0.0
) -> jnp.ndarray:
    """torch CosineAnnealingLR(T_max=total_epochs): closed form
    lr = eta_min + (base - eta_min) * (1 + cos(pi * e / T_max)) / 2."""
    e = epoch.astype(jnp.float32)
    return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(math.pi * e / total_epochs))


def gamma_ramp(iteration: jnp.ndarray, gamma: float, ramp_up_end_step: int) -> jnp.ndarray:
    """gamma * min(1, it / ramp_end) — ``models/vit_som.py:89-90``.

    ``ramp_up_end_step`` is ``estimated_stepping_batches // 2`` =
    ``(steps_per_epoch * total_epochs) // 2`` with drop_last step counts.
    """
    frac = iteration.astype(jnp.float32) / max(1, ramp_up_end_step)
    return gamma * jnp.minimum(1.0, frac)


def make_lr_schedule(opt_cfg, total_epochs: int, steps_per_epoch: int, base_lr: float):
    """Return step -> lr, replicating per-epoch LambdaLR stepping.

    PyTorch LambdaLR evaluates the factor at the current epoch index
    (epoch 0 during the first epoch). We map step -> epoch via integer
    division by steps_per_epoch, so LR changes exactly at epoch boundaries.
    """
    sched = opt_cfg.scheduler

    def schedule(step):
        epoch = jnp.asarray(step) // steps_per_epoch
        if sched == "cosine_annealing":
            if opt_cfg.warmup_epochs > 0:
                factor = warmup_cosine_epoch_factor(
                    epoch, opt_cfg.warmup_epochs, total_epochs, opt_cfg.min_lr
                )
                return base_lr * factor
            # DeiT/MobileViT style (no explicit warmup in their configs)
            return cosine_annealing_lr(epoch, base_lr, total_epochs)
        if sched == "cosine_simple":
            return cosine_annealing_lr(epoch, base_lr, total_epochs)
        return jnp.asarray(base_lr, dtype=jnp.float32)

    return schedule


def make_swin_lr_schedule(opt_cfg, total_epochs: int, steps_per_epoch: int, base_lr: float):
    def schedule(step):
        epoch = jnp.asarray(step) // steps_per_epoch
        factor = swin_warmup_cosine_factor(
            epoch, opt_cfg.warmup_epochs, total_epochs, opt_cfg.min_lr, base_lr
        )
        return base_lr * factor

    return schedule
