"""Measure steady-state clustering-train throughput for a config-override set.

Same protocol as bench.py (self-calibrating warmup, airtight device_get
fence) but takes overrides from the CLI so kernel/dtype variants can be
A/B-tested on the real chip in fresh processes:

    python experiments/bench_variant.py train.use_pallas_attention=true
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_IMG_PER_SEC = 500 * 546 * 128 / 2432.052


def _parse(v: str):
    import yaml

    return yaml.safe_load(v)


def main():
    from vitsom_tpu.utils.compilation_cache import maybe_enable

    maybe_enable()

    import jax

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    overrides = {
        "som.map_size": [24, 24],
        "total_epochs": 500,
        "data.allow_synthetic": True,
        "data.synthetic_size": 70000,
        "train.n_runs": 1,
        "train.use_pallas_som": True,
        "train.compute_dtype": "bfloat16",
    }
    for arg in sys.argv[1:]:
        k, _, v = arg.partition("=")
        overrides[k] = _parse(v)

    cfg = load_config("configs/vit_som/vit_som_mnist.yaml", overrides=overrides)
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm, run_id=0)
    images, labels = dm.device_arrays(dm.train, train_mode=True)
    epoch_fn = trainer._build_epoch_fn()
    key = jax.random.key(0)
    state = trainer.state

    def run_epoch(state, key):
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, _, _ = epoch_fn(state, sub, images, labels)
        _ = int(jax.device_get(state.step))
        return state, key, time.time() - t0

    epoch_times = []
    for i in range(12):
        state, key, dt = run_epoch(state, key)
        epoch_times.append(dt)
        print(f"# warmup epoch {i}: {dt:.2f}s", file=sys.stderr)
        if len(epoch_times) >= 3 and all(
            t < 1.25 * min(epoch_times) for t in epoch_times[-2:]
        ):
            break

    n_epochs = 3
    t0 = time.time()
    for _ in range(n_epochs):
        state, key, _ = run_epoch(state, key)
    dt = time.time() - t0

    img_per_sec = n_epochs * dm.steps_per_epoch * cfg.batch_size / dt
    print(
        json.dumps(
            {
                "overrides": {k: v for k, v in overrides.items()},
                "images_per_sec": round(img_per_sec, 1),
                "ms_per_step": round(1000 * dt / (n_epochs * dm.steps_per_epoch), 3),
                "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
            },
            default=str,
        )
    )


if __name__ == "__main__":
    main()
