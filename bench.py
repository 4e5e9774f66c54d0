"""Benchmark: ViT-SOM (24x24) MNIST-clustering training throughput.

North-star metric per BASELINE.md: the reference trains ViT-SOM 24x24 on
MNIST for 500 epochs in 2432.052 s on one CUDA GPU
(``/root/reference/README.md:87``) = 500 epochs x 546 steps x 128 images
/ 2432 s = 14,368 images/sec. This bench measures our steady-state training
throughput per chip on the identical workload shape (70k MNIST-sized images,
the shipped vit_som mnist config with the paper's 24x24 map) and reports
``vs_baseline`` = ours / reference.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_IMG_PER_SEC = 500 * 546 * 128 / 2432.052


def main():
    from vitsom_tpu.utils.compilation_cache import maybe_enable

    maybe_enable()

    import jax
    import jax.numpy as jnp

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    cfg = load_config(
        "configs/vit_som/vit_som_mnist.yaml",
        overrides={
            "som.map_size": [24, 24],  # paper's 24x24 variant (README.md:79,87)
            "total_epochs": 500,
            "data.allow_synthetic": True,  # zero-egress image: MNIST-shaped stand-in
            "data.synthetic_size": 70000,  # == len(MNIST train+test concat)
            "train.n_runs": 1,
            "train.use_pallas_som": True,  # fused SOM kernel (tests prove parity)
            # bf16 block compute: clustering-quality parity with f32 validated
            # (purity match on the synthetic protocol, commit 2ec5f3b); params
            # and LN statistics stay f32.
            "train.compute_dtype": "bfloat16",
            # native bf16 [B, H, N, N] score/prob tensors, softmax included:
            # the step is HBM-bound on exactly those tensors, and halving the
            # bytes per softmax pass measured 2.07 -> 1.46 ms/step on v5e.
            # Quality validated like compute_dtype: purity parity with f32 on
            # the 40-epoch clustering protocol.
            "train.attn_impl": "xla_bf16",
            # remat now HURTS: with bf16 residuals, storing them beats
            # replaying the blocks (1.46 no-remat vs 1.71 remat, measured) —
            # the reverse of the f32-residual trade (2.44 -> 2.07 with remat)
            "train.remat_blocks": False,
        },
    )
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm, run_id=0)

    assert dm.is_static, "mnist clustering path must be device-resident"
    images, labels = dm.device_arrays(dm.train, train_mode=True)
    # Same program shape the shipped 500-epoch protocol dispatches
    # (train.epochs_per_dispatch=25): the SUSTAINED rate is the honest
    # number. Step-counter fences return early on this backend (a 3-epoch
    # window once read 0.84 s/epoch that way); the loss-means fence below
    # was validated by conservation — 11 consecutive fenced dispatches at
    # 23.59-23.62 s flat (fence_probe, r3), any leak in dispatch d would
    # surface as a slow dispatch d+1.
    edisp = 25
    epoch_fn = trainer._build_epoch_fn(n_epochs=edisp)
    key = jax.random.key(0)
    state = trainer.state

    def run_dispatch(state, key):
        """One edisp-epoch dispatch, fenced by pulling the per-epoch loss
        means (data-dependent on every train step). Fence trust on this
        backend comes from CONSERVATION, not faith: ab_queue.py ran a
        palindrome of 1/2/4/8-dispatch blocks with this fence and every
        block read 0.9426-0.9438 s/epoch with the 550-epoch sequence wall
        agreeing to 0.1% — any early-return leak would have shown up as a
        slow successor block."""
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, means, _ = epoch_fn(state, sub, images, labels)
        jax.device_get(means["train/total_loss"])
        return state, key, means, time.time() - t0, None

    # Warm up until steady state: the first 2-3 executions of a freshly
    # compiled program run 10-20x slow on this backend (executable
    # upload/warm-up), and tunnel performance varies run to run — so
    # calibrate instead of assuming a fixed warmup count.
    times = []
    for i in range(6):
        state, key, _, dt, _ = run_dispatch(state, key)
        times.append(dt)
        print(
            f"# warmup dispatch {i}: {dt:.2f}s ({dt/edisp:.3f}s/epoch)",
            file=sys.stderr,
        )
        if len(times) >= 2 and all(
            t < 1.10 * min(times) for t in times[-2:]
        ):
            break

    # timed window: 2 sustained fenced dispatches = 50 epochs. The 500-epoch
    # protocol (full_protocol_r3d) independently pins this rate by pure
    # wall-clock conservation: 19 consecutive dispatches at 23.60 s flat
    # inside a 480 s fit phase.
    n_disp = 2
    t0 = time.time()
    for d in range(n_disp):
        state, key, _, _, _ = run_dispatch(state, key)
    dt = time.time() - t0
    n_epochs = n_disp * edisp

    # NOTE on epoch accounting: steps_per_epoch here is 656 (the synthetic
    # split yields an 84k-row train set), not the reference's 546 (70k,
    # drop_last). img/s is work-normalized so the comparison is fair — and
    # the 500-epoch protocol comparison is conservative: it runs 1.2x the
    # reference's steps and still beats 5x. When converting img/s to
    # "s/epoch", divide by THIS epoch's 656 steps (0.944 s), not 546
    # (0.786 s) — mixing the two once produced a phantom fence-leak scare.
    steps = dm.steps_per_epoch
    img_per_sec = n_epochs * steps * cfg.batch_size / dt
    n_chips = 1
    value = img_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "vit_som_24x24_mnist_train_images_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / REFERENCE_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
