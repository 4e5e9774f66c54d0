"""Schedule parity tests against the torch formulas in the reference."""

import math

import jax.numpy as jnp
import numpy as np

from vitsom_tpu.config import OptimizerConfig
from vitsom_tpu.train import schedules


def torch_lambda(epoch, warmup, total, min_lr):
    # reference models/vit_som.py:160
    return max(min_lr, min((epoch + 1) / (warmup + 1e-8), 0.5 * (math.cos(epoch / total * math.pi) + 1)))


def test_warmup_cosine_epoch_factor_matches_reference_lambda():
    warmup, total, min_lr = 25, 500, 1e-5
    for e in [0, 1, 10, 24, 25, 26, 100, 250, 499]:
        got = float(
            schedules.warmup_cosine_epoch_factor(jnp.asarray(e), warmup, total, min_lr)
        )
        want = torch_lambda(e, warmup, total, min_lr)
        assert np.isclose(got, want, rtol=1e-5), (e, got, want)


def test_lr_schedule_steps_per_epoch_boundaries():
    opt = OptimizerConfig(scheduler="cosine_annealing", warmup_epochs=25, min_lr=1e-5, lr=0.01)
    sched = schedules.make_lr_schedule(opt, total_epochs=500, steps_per_epoch=100, base_lr=0.005)
    # first epoch: factor = 1/25
    assert np.isclose(float(sched(0)), 0.005 * torch_lambda(0, 25, 500, 1e-5))
    assert np.isclose(float(sched(99)), float(sched(0)))
    # epoch boundary at step 100
    assert np.isclose(float(sched(100)), 0.005 * torch_lambda(1, 25, 500, 1e-5))


def test_swin_factor_matches_reference():
    # reference models/swin.py:75-85
    base_lr, min_lr, warmup, total = 5e-4, 1e-6, 20, 500
    for e in [0, 1, 19, 20, 21, 260, 499]:
        got = float(
            schedules.swin_warmup_cosine_factor(jnp.asarray(e), warmup, total, min_lr, base_lr)
        )
        if e < warmup:
            want = e / warmup
        else:
            progress = (e - warmup) / (total - warmup)
            cd = 0.5 * (1 + math.cos(math.pi * progress))
            want = (1 - min_lr / base_lr) * cd + min_lr / base_lr
        assert np.isclose(got, want, rtol=1e-5), e


def test_cosine_annealing_lr():
    # torch CosineAnnealingLR closed form
    for e in [0, 100, 250, 500]:
        got = float(schedules.cosine_annealing_lr(jnp.asarray(e), 1e-3, 500))
        want = 0.5 * 1e-3 * (1 + math.cos(math.pi * e / 500))
        assert np.isclose(got, want, rtol=1e-6)


def test_gamma_ramp():
    # reference models/vit_som.py:89-90
    g = 0.005
    ramp_end = 1000
    assert float(schedules.gamma_ramp(jnp.asarray(0), g, ramp_end)) == 0.0
    assert np.isclose(float(schedules.gamma_ramp(jnp.asarray(500), g, ramp_end)), g / 2)
    assert np.isclose(float(schedules.gamma_ramp(jnp.asarray(1000), g, ramp_end)), g)
    assert np.isclose(float(schedules.gamma_ramp(jnp.asarray(5000), g, ramp_end)), g)
