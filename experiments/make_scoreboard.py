"""Render the family scoreboard (experiments/run_family_bench.py output)
as a markdown table for PARITY.md / README.md.

Merges ``family_bench_r3/summary.json`` rows with peak-memory telemetry
from the per-row raw harness jsons, against the reference wall-clock rows
(``/root/reference/README.md:87-95``, quoted in BASELINE.md).

Usage: python experiments/make_scoreboard.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "results", "family_bench_r3")

LABELS = {
    "vit_som_cluster_24": "ViT-SOM (24×24) MNIST clustering",
    "vit_som_cluster_40": "ViT-SOM (40×40) MNIST clustering",
    "desom": "DESOM MNIST clustering",
    "vit_som_cls": "ViT-SOM (4×4) CIFAR-10 classification",
    "vit": "ViT CIFAR-10 classification",
    "swin": "Swin-T CIFAR-10 classification",
    "deit": "DeiT-T CIFAR-10 classification (distilled)",
    "mobile_vit": "MobileViT-S CIFAR-10 classification",
}

BASELINES = {  # seconds, /root/reference/README.md:87-95
    "vit_som_cluster_24": (2432.052, 1.60),
    "vit_som_cluster_40": (2432.05, 1.61),
    "desom": (188.590, 0.697),
    "vit_som_cls": (2923.095, 8.471),
    "vit": (2816.594, 0.620),
    "swin": (2935.20, 0.891),
    "deit": (4135.05, 0.912),
    "mobile_vit": (3162.33, 0.791),
}


def main():
    with open(os.path.join(OUT_DIR, "summary.json")) as f:
        summary = json.load(f)

    print(
        "Every wall-clock row the reference CAN run is scored below. "
        "BASELINE.md's remaining wall-clock rows (SOM-VAE 463.2 s) and "
        "accuracy rows (SOM, SOM-VAE, ResNet34) are third-party numbers "
        "the reference README quotes from other papers — no code for them "
        "exists in the reference repo (models/: ae, deit, desom, mobile_vit, "
        "som_layer, swin, vit, vit_som only).\n"
    )
    print(
        "| Benchmark | Reference (1× GPU) | This repo (1× v5e, end-to-end) "
        "| Ratio | img/s/chip | Inference | Quality (synthetic protocol) "
        "| Peak mem (lower bound) |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for name, label in LABELS.items():
        row = summary.get(name)
        base_s, base_inf = BASELINES[name]
        if not row or "error" in row:
            print(f"| {label} | {base_s:.1f} s | (not recorded) | | | | | |")
            continue
        mem = ""
        # prefer XLA's AOT buffer-assignment estimate (argument+output+temp
        # minus donation aliases — trainer.memory_analysis; comparable
        # across configs, unlike the live-arrays lower bound)
        ma = row.get("memory_analysis") or {}
        if ma.get("peak_gb_estimate") is not None:
            mem = f"{ma['peak_gb_estimate']:.3f} GB (AOT est.)"
        raw_path = os.path.join(OUT_DIR, f"{name}.json")
        if os.path.exists(raw_path):
            with open(raw_path) as f:
                raw = json.load(f)
            if raw.get("peak_memory_gb"):
                lb = f"{raw['peak_memory_gb'][0]:.3f} GB live"
                mem = f"{mem}; {lb}" if mem else lb
        inf = f"{row['inference_time_s']:.3f} s"
        if base_inf:
            inf += f" ({base_inf / row['inference_time_s']:.2f}× vs {base_inf} s)"
        if "purity" in row:
            quality = f"purity {row['purity']:.3f} / NMI {row['nmi']:.3f}"
        elif "accuracy" in row:
            quality = f"acc {row['accuracy']:.3f}"
        else:
            quality = ""
        if row.get("note"):
            # e.g. the DeiT random-teacher annotation (no resnet50.pth in
            # the zero-egress image) — quality is architecture-parity only
            quality = f"{quality} — {row['note']}" if quality else row["note"]
        print(
            f"| {label} | {base_s:.1f} s | **{row['run_duration_s']:.1f} s** "
            f"| **{row['vs_baseline']:.2f}×** "
            f"| {row['images_per_sec_per_chip'] / 1000:.1f}k | {inf} "
            f"| {quality} | {mem} |"
        )


if __name__ == "__main__":
    main()
