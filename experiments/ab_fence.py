"""Fence-strength experiment: is device_get(state.step) airtight?

state.step is a loop induction counter — its final value is data-independent
of the epoch's math, so the runtime MAY materialize its output buffer before
the params finish updating (bench.py's docstring assumed otherwise). The
loss metric IS data-dependent on every train step. This measures the same
f32 single-epoch program with both fences, individually and bench-style
(aggregate over 3), in one process.

    python experiments/ab_fence.py
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

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

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
        },
    )
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm, run_id=0)
    images, labels = dm.device_arrays(dm.train, train_mode=True)
    epoch_fn = trainer._build_epoch_fn(n_epochs=1)
    key = jax.random.key(0)
    state = trainer.state

    def run(state, key, fence):
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, means, _ = epoch_fn(state, sub, images, labels)
        if fence == "step":
            jax.device_get(state.step)
        else:  # loss: data-dependent on every train step's params
            jax.device_get(means["train/total_loss"])
        return state, key, time.time() - t0

    # warm up (loss fence = strongest)
    for i in range(8):
        state, key, dt = run(state, key, "loss")
        print(f"# warm {i}: {dt:.3f}s", file=sys.stderr, flush=True)

    out = {}
    for fence in ("step", "loss"):
        ind = []
        for _ in range(4):
            state, key, dt = run(state, key, fence)
            ind.append(dt)
        t0 = time.time()
        for _ in range(3):
            state, key, _ = run(state, key, fence)
        agg3 = (time.time() - t0) / 3
        out[fence] = {
            "individual_s": [round(t, 3) for t in ind],
            "bench_style_agg3_s": round(agg3, 4),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
