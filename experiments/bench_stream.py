"""Benchmark: host-PIL stream path (fork pool + chunked prefetch) on TPU.

VERDICT r2 #5: flowers-17/102 and tiny-imagenet cannot use device-augment
(variable-size object arrays, ``data/pipeline.py``) and fall back to the
host fork pool + chunked device prefetch — a path that had never been
measured feeding the chip. This bench drives it with a variable-size
synthetic stand-in at the flowers-17 shape (224x224 train crops, ViT-SOM
emb 192 depth 12, batch 128) and reports warm epoch throughput.

Reference comparator: the GPU cls rows run ~6.8k img/s (ViT-SOM 4x4 cls,
2923 s / 500 epochs / 312 steps / 128, ``/root/reference/README.md:91``);
flowers-17 itself has no published wall-clock row, so the number recorded
here is the evidence that the stream path does or does not starve the chip
(vs. the known device-augment rate at a comparable model shape).

Prints one JSON line.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vitsom_tpu.utils.compilation_cache import maybe_enable

    maybe_enable()

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    epochs = int(os.environ.get("BENCH_STREAM_EPOCHS", "6"))
    cfg = load_config(
        "configs/vit_som/vit_som_flowers-17.yaml",
        overrides={
            "total_epochs": epochs,
            "data.allow_synthetic": True,
            "data.synthetic_size": 1360,  # flowers-17: 17 classes x 80
            "data.synthetic_object_array": True,
            "train.n_runs": 1,
            "train.compute_dtype": "bfloat16",
            "train.attn_impl": "xla_bf16",
            "train.eval_every_n_epochs": 10_000,  # isolate the train path
        },
    )
    dm = build_datamodule(cfg)
    assert not dm.is_static and not dm.use_device_augment, (
        "stand-in must exercise the host stream path"
    )
    trainer = Trainer(cfg, dm=dm, run_id=0)

    # first fit pays compile + pool spin-up + executable warm-up
    t0 = time.time()
    trainer.fit(progress=False)
    first = time.time() - t0

    # warm measurement: fit again on the SAME trainer — stream mode re-runs
    # cfg.total_epochs epochs from the current state with warm chunk fns,
    # warm worker pool, warm executables
    t0 = time.time()
    trainer.fit(progress=False)
    steady = time.time() - t0

    steps = dm.steps_per_epoch
    ips = cfg.batch_size * steps * epochs / steady
    print(
        json.dumps(
            {
                "metric": "vit_som_flowers17_stream_train_images_per_sec_per_chip",
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "first_fit_s": round(first, 1),
                "steady_fit_s": round(steady, 1),
                "steps_per_epoch": steps,
                "epochs_timed": epochs,
            }
        )
    )


if __name__ == "__main__":
    main()
