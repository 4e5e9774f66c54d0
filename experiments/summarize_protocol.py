"""Aggregate full-protocol repetitions into mean±std (VERDICT r3 #5).

The reference reports its flagship wall-clock as mean±std over 5 runs
(reference experiments/benchmarking/train_vit_som.py:120-130: 2432.05
± 10.9 s). This reads every ``full_protocol_<tag>_<n>.json`` produced by
``run_protocol.py`` and prints the comparable aggregate.

Usage: python experiments/summarize_protocol.py [tag]   (default: r4)
"""

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
RESULTS = os.path.join(REPO, "experiments", "results")
BASELINE_S = 2432.052  # reference README.md:87 (mean of 5, ±10.9 s)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r4"
    paths = sorted(glob.glob(os.path.join(RESULTS, f"full_protocol_{tag}_[0-9]*.json")))
    rows = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        # `or [None]` (not a dict default): classification-protocol JSONs
        # record EMPTY lists for unused metrics, which a plain .get default
        # would not cover (ADVICE r4)
        rows.append({
            "file": os.path.basename(p),
            "run_duration_s": d["run_duration"][0],
            "purity": (d.get("purity") or [None])[0],
            "nmi": (d.get("nmi") or [None])[0],
            "img_per_s": (d.get("images_per_sec_per_chip") or [None])[0],
        })
    if not rows:
        print(f"no full_protocol_{tag}_*.json under {RESULTS}")
        return
    durs = np.array([r["run_duration_s"] for r in rows])
    out = {
        "tag": tag,
        "n": len(rows),
        "runs_s": [round(float(d), 1) for d in durs],
        "mean_s": round(float(durs.mean()), 1),
        # ddof=0 (population std) matches the reference's np.std aggregation
        # that produced the cited ±10.9 s (train_vit_som.py:126) — ADVICE r4
        "std_s": round(float(durs.std(ddof=0)), 1) if len(rows) > 1 else 0.0,
        "baseline_s": BASELINE_S,
        "vs_baseline_mean": round(BASELINE_S / float(durs.mean()), 2),
        "rows": rows,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
