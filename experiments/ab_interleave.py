"""Drift-proof epoch-program A/B: build several variants in ONE process and
alternate dispatches round-robin, so tunnel-window drift hits every variant
equally. Reports steady per-epoch seconds per variant (min over rounds).

Variants: {u8, f32} x {out_shardings, none}, single-epoch programs.
The state is NOT donated here (each variant would invalidate the shared
state) — donation is worth ~0 for timing comparisons because the programs
are identical modulo the input path, and every variant pays the same cost.

    python experiments/ab_interleave.py [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vitsom_tpu.utils.compilation_cache import maybe_enable

    maybe_enable()

    import jax
    import jax.numpy as jnp

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train import trainer as trainer_lib

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    cfg = load_config(
        "configs/vit_som/vit_som_mnist.yaml",
        overrides={
            "som.map_size": [24, 24],
            "total_epochs": 500,
            "data.allow_synthetic": True,
            "data.synthetic_size": 70000,
            "train.n_runs": 1,
            "train.use_pallas_som": True,
            "train.compute_dtype": "bfloat16",
            "train.attn_impl": "xla_bf16",
            "train.remat_blocks": False,
            "train.donate_state": False,
        },
    )
    dm = build_datamodule(cfg)
    trainer = trainer_lib.Trainer(cfg, dm=dm, run_id=0)

    imgs_f32, lbls_f32 = dm.device_arrays(dm.train, train_mode=True)
    imgs_u8, lbls_u8 = dm.raw_device_arrays(dm.train, mesh=trainer.mesh)

    def u8_aug(key, batch):
        return batch.astype(jnp.float32) / 255.0

    variants = {}
    for name, (aug, data) in {
        "f32_out": (None, (imgs_f32, lbls_f32)),
        "u8_out": (u8_aug, (imgs_u8, lbls_u8)),
        "f32_noout": (None, (imgs_f32, lbls_f32)),
    }.items():
        if name.endswith("noout"):
            os.environ["VITSOM_NO_OUT_SHARDINGS"] = "1"
        else:
            os.environ.pop("VITSOM_NO_OUT_SHARDINGS", None)
        fn = trainer._build_epoch_fn(augment_fn=aug, n_epochs=1)
        variants[name] = (fn, data)

    key = jax.random.key(0)
    # independent state per variant: the epoch fns donate their state arg,
    # and cross-feeding states between out_shardings/noout variants would
    # silently retrace (jit caches on input shardings)
    host_state = jax.device_get(trainer.state)
    states = {name: jax.device_put(host_state) for name in variants}
    times = {name: [] for name in variants}
    for r in range(rounds):
        for name, (fn, (images, labels)) in variants.items():
            key, sub = jax.random.split(key)
            t0 = time.time()
            states[name], _, _ = fn(states[name], sub, images, labels)
            jax.device_get(states[name].step)
            dt = time.time() - t0
            times[name].append(dt)
            print(f"# round {r} {name}: {dt:.3f}s", file=sys.stderr, flush=True)

    summary = {
        name: {
            "min_s": round(min(ts), 4),
            "last3_mean_s": round(sum(ts[-3:]) / 3, 4),
            "all": [round(t, 3) for t in ts],
        }
        for name, ts in times.items()
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
