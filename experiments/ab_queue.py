"""Queue-depth experiment: do UN-fenced back-to-back dispatches pipeline
better than fenced ones at large epochs_per_dispatch?

History: with 1-epoch programs and hundreds of queued dispatches, unfenced
streaming measured ~3x SLOWER per epoch (stream-scheduler degradation), so
the trainer fences every dispatch (train.fence_every_n_dispatches=1). But
bench.py's 2-dispatch unfenced window on the 25-epoch program read 0.785
s/epoch vs 0.944 fenced — either the closing fence leaks, or per-dispatch
fencing costs ~4 s of pipeline drain at this program size and a bounded
queue (2-8 dispatches) is the right operating point.

This measures blocks of q back-to-back dispatches (q = 1, 2, 4, 8), each
block closed by ONE device_get of the last dispatch's per-epoch loss means
(data-dependent on every step). Leak detection is by conservation: any tail
work leaking past block k's close lands in block k+1's wall, so a one-off
fast block shows up as a slow successor; a sustained rate across
consecutive blocks is real.

    python experiments/ab_queue.py [edisp]
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

    edisp = int(sys.argv[1]) if len(sys.argv) > 1 else 25

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
    epoch_fn = trainer._build_epoch_fn(n_epochs=edisp)
    key = jax.random.key(0)
    state = trainer.state

    def block(state, key, q):
        """q back-to-back dispatches, closed by one loss-means readback."""
        t0 = time.time()
        for _ in range(q):
            key, sub = jax.random.split(key)
            state, means, _ = epoch_fn(state, sub, images, labels)
        jax.device_get(means["train/total_loss"])
        return state, key, time.time() - t0

    # warm up (fenced singles)
    for i in range(4):
        state, key, dt = block(state, key, 1)
        print(f"# warm {i}: {dt:.2f}s ({dt/edisp:.3f}s/epoch)", file=sys.stderr)

    rows = []
    t_seq0 = time.time()
    for q in (1, 2, 4, 8, 4, 2, 1):  # palindrome: leaks show as slow successors
        state, key, dt = block(state, key, q)
        rows.append({"q": q, "block_s": round(dt, 2),
                     "epoch_s": round(dt / (q * edisp), 4)})
        print(f"# q={q}: {dt:.2f}s ({dt/(q*edisp):.4f}s/epoch)",
              file=sys.stderr, flush=True)
    seq_wall = time.time() - t_seq0
    n_epochs = sum(r["q"] for r in rows) * edisp
    print(json.dumps({
        "edisp": edisp,
        "blocks": rows,
        "sequence_wall_s": round(seq_wall, 2),
        "sequence_epoch_s": round(seq_wall / n_epochs, 4),
    }))


if __name__ == "__main__":
    main()
