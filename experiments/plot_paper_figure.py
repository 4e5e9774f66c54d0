"""Reproduce the paper's params-vs-metric figure (reference ``tools/plot.py``
hard-codes the table values; same values here, rendered through the viz
suite — pass --csv to plot your own results instead)."""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from vitsom_tpu.eval.viz import plot_params_vs_metric

# model, params (M), purity (clustering) or None, accuracy (cls) or None —
# values from the reference README tables (README.md:69-80 and tools/plot.py)
PAPER_ROWS = [
    ("DESOM", 0.63, 0.934, None),
    ("ViT-SOM-24", 2.2, 0.936, None),
    ("ViT-SOM-40", 5.4, 0.955, None),
    ("ViT-SOM-cls", 5.5, None, 0.920),
    ("ViT", 5.3, None, 0.915),
    ("Swin-T", 27.6, None, 0.918),
    ("DeiT-T", 5.7, None, 0.905),
    ("MobileViT-S", 5.6, None, 0.912),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", type=str, default=None,
                   help="csv with columns name,params_m,purity,accuracy")
    p.add_argument("--out", type=str, default="img/params_vs_metric.pdf")
    args = p.parse_args()

    rows = PAPER_ROWS
    if args.csv:
        rows = []
        with open(args.csv) as f:
            for r in csv.DictReader(f):
                rows.append((
                    r["name"], float(r["params_m"]),
                    float(r["purity"]) if r.get("purity") else None,
                    float(r["accuracy"]) if r.get("accuracy") else None,
                ))

    out = plot_params_vs_metric(
        names=[r[0] for r in rows],
        n_params_m=[r[1] for r in rows],
        purity=[r[2] for r in rows],
        accuracy=[r[3] for r in rows],
        out_path=args.out,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
