"""Attention score-dtype quality study v2 — NON-SATURATING synthetic task.

VERDICT r2 #7: the original study ran on trivially-separable blobs where
purity pins at 1.0 (a plumbing check, not a recipe check). v2 uses the
overlapping-class generator (``data.synthetic_overlap`` — Gaussian class
means with tunable pairwise Bayes error, ``datasets.make_synthetic``) so
purity/NMI have headroom to move, then re-runs the 4-seed x
{f32 ctrl, xla_bf16, xla_bf16s} protocol on the real TPU.

Protocol (matches v1, ``experiments/results/attn_dtype_quality/README.md``):
ViT-SOM 24x24 clustering, 40 epochs, synthetic_size 4096, bf16 compute,
fused SOM kernel, seeds 0-3. Each run is a fresh process (tunnel compile
stalls in long-lived processes).

Usage: python experiments/run_quality_v2.py [impl_seed ...]
  e.g. python experiments/run_quality_v2.py ctrl_0 xla_bf16_2
"""

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT_DIR = os.path.join(REPO, "experiments", "results", "attn_dtype_quality_v2")

IMPLS = {"ctrl": "xla", "xla_bf16": "xla_bf16", "xla_bf16s": "xla_bf16s"}
# per-impl EXTRA overrides beyond attn_impl (e.g. the bf16 HBM dataset
# variant rides the same quality protocol)
EXTRA = {"bf16h": ["data.hbm_dtype=bfloat16"]}
IMPLS["bf16h"] = "xla_bf16"
SEEDS = (0, 1, 2, 3)
# Overridable: the overlap knob calibrates the PAIRWISE SUPERVISED Bayes
# error of an optimal 1-D projection; unsupervised pixel-space clustering
# needs far smaller values to see any structure (at 0.1 the class-mean
# separation is 0.18 vs a per-image noise radius of sigma*sqrt(d)=2.8 —
# every arm measured purity ~= the 0.1 random floor). 0.001 with the g4
# orthonormal-smooth generator lands mid-range (purity 0.376 / NMI 0.343
# at 40 epochs, measured on-chip) — maximum sensitivity to a recipe
# error in either direction. Calibration trail:
# experiments/results/attn_dtype_quality_v2/calibration.json.
OVERLAP = float(os.environ.get("QUALITY_V2_OVERLAP", "0.001"))
# "g2" (white-noise dirs; the seed-stable un-augmented operating point) or
# "g4" (smooth-span; collapses on ~half the seeds at ov=0.001 — see
# attn_dtype_quality_v2/VERDICT.md). Non-default runs land in a subdir.
GEN = os.environ.get("QUALITY_V2_GEN", "g4")
EPOCHS = os.environ.get("QUALITY_V2_EPOCHS", "40")
SUBDIR = os.environ.get("QUALITY_V2_SUBDIR", "")


def run_one(impl: str, seed: int) -> dict:
    out_dir = os.path.join(OUT_DIR, SUBDIR) if SUBDIR else OUT_DIR
    os.makedirs(out_dir, exist_ok=True)
    out_json = os.path.join(out_dir, f"{impl}_s{seed}.json")
    cmd = [
        sys.executable, "experiments/benchmarking/train.py",
        "--config", "configs/vit_som/vit_som_mnist.yaml",
        "--synthetic", "--epochs", EPOCHS, "--runs", "1",
        "--override", "som.map_size=[24,24]",
        "--override", f"data.synthetic_overlap={OVERLAP}",
        "--override", f"data.synthetic_gen={GEN}",
        "--override", "train.use_pallas_som=true",
        "--override", "train.compute_dtype=bfloat16",
        "--override", "train.remat_blocks=false",
        "--override", "train.epochs_per_dispatch=10",
        "--override", f"train.seed={seed}",
        "--override", f"train.attn_impl={IMPLS[impl]}",
        "--json-out", out_json,
    ]
    for ov in EXTRA.get(impl, []):
        cmd += ["--override", ov]
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:], proc.stderr[-2000:])
        return {"impl": impl, "seed": seed, "error": proc.returncode}
    with open(out_json) as f:
        res = json.load(f)
    row = {"impl": impl, "seed": seed,
           "purity": res["purity"][0], "nmi": res["nmi"][0]}
    print(json.dumps(row), flush=True)
    return row


def main():
    if len(sys.argv) > 1:
        jobs = []
        for spec in sys.argv[1:]:
            impl, _, seed = spec.rpartition("_")
            jobs.append((impl, int(seed)))
    else:
        jobs = [(impl, s) for impl in IMPLS for s in SEEDS]
    rows = [run_one(impl, s) for impl, s in jobs]
    out_dir = os.path.join(OUT_DIR, SUBDIR) if SUBDIR else OUT_DIR
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
