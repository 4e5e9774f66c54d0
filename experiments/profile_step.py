"""Profile the ViT-SOM clustering train step on the real TPU.

Runs the bench workload (vit_som mnist, 24x24 map, bf16) for a few epochs,
captures a jax.profiler trace of one steady-state epoch, and prints the
top ops by self-time parsed from the perfetto trace. Usage:

    python experiments/profile_step.py [--outdir /tmp/vitsom_trace]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/vitsom_trace")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--config", default="configs/vit_som/vit_som_mnist.yaml",
        help="base config (e.g. configs/vit_som/vit_som_cifar-10.yaml to "
        "profile the classification + on-device-augmentation step)",
    )
    ap.add_argument("overrides", nargs="*", help="config k=v overrides")
    args = ap.parse_args()

    import jax
    import yaml

    from vitsom_tpu.config import load_config
    from vitsom_tpu.data.pipeline import build_datamodule
    from vitsom_tpu.train.trainer import Trainer

    overrides = {
        "total_epochs": 500,
        "data.allow_synthetic": True,
        "train.n_runs": 1,
        "train.use_pallas_som": True,
        "train.compute_dtype": args.dtype,
        "train.use_pallas_attention": os.environ.get("PROFILE_PALLAS_ATTN", "") == "1",
    }
    if args.config.endswith("vit_som_mnist.yaml"):
        # the bench workload: 24x24 paper variant on the full-size stand-in
        overrides["som.map_size"] = [24, 24]
        overrides["data.synthetic_size"] = 70000
    for arg in args.overrides:
        k, _, v = arg.partition("=")
        overrides[k] = yaml.safe_load(v)

    cfg = load_config(args.config, overrides=overrides)
    dm = build_datamodule(cfg)
    trainer = Trainer(cfg, dm=dm, run_id=0)
    # mirror Trainer.fit's scan-mode data path: augmented uniform datasets
    # profile WITH the on-device augmentation stack inside the epoch program
    # (host-transforming the split here would both misattribute the step
    # cost and take minutes per 50k images on this 1-core host)
    if dm.use_device_augment:
        from vitsom_tpu.data.device_augment import make_device_train_augment

        images, labels = dm.raw_device_arrays(dm.train)
        aug_fn = make_device_train_augment(cfg.data)
    else:
        images, labels = dm.device_arrays(dm.train, train_mode=True)
        aug_fn = None
    epoch_fn = trainer._build_epoch_fn(augment_fn=aug_fn)
    key = jax.random.key(0)
    state = trainer.state

    def run_epoch(state, key):
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, _, _ = epoch_fn(state, sub, images, labels)
        _ = int(jax.device_get(state.step))
        return state, key, time.time() - t0

    for i in range(8):
        state, key, dt = run_epoch(state, key)
        print(f"# warmup epoch {i}: {dt:.2f}s", file=sys.stderr)
        if i >= 2 and dt < 1.6:
            break

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        state, key, dt = run_epoch(state, key)
    print(f"# traced epoch: {dt:.2f}s", file=sys.stderr)

    # parse perfetto trace: sum durations by op name on the device track
    traces = sorted(glob.glob(os.path.join(args.outdir, "**/*.trace.json.gz"), recursive=True))
    if not traces:
        print("no trace.json.gz found under", args.outdir, file=sys.stderr)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device pids (TPU / device:)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    print("# processes:", json.dumps(pid_names), file=sys.stderr)

    tot = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        d = e.get("dur", 0) / 1e3  # us -> ms
        tot[e["name"]] += d
        cnt[e["name"]] += 1
        total += d
    n_steps = images.shape[0] // cfg.batch_size
    print(f"total device time: {total:.1f} ms over traced epoch ({n_steps} steps)")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:60]:
        print(
            f"{t:10.2f} ms  {cnt[name]:6d}x  {t/n_steps*1000:8.2f} us/step  "
            f"{name[:140]}"
        )


if __name__ == "__main__":
    main()
