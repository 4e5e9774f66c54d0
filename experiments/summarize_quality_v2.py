"""Render the non-saturating quality study (run_quality_v2.py output) as a
markdown table + per-impl means for the study README / PARITY.md.

Usage: python experiments/summarize_quality_v2.py [subdir]
  (no arg: the main g4/ov0.001 arm; subdir e.g. g2_ov0.001, overlap_0.1)
"""

import glob
import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "results", "attn_dtype_quality_v2")
IMPLS = ("ctrl", "xla_bf16", "xla_bf16s", "bf16h")
SEEDS = (0, 1, 2, 3)


def load(out_dir):
    rows = {}
    for p in glob.glob(os.path.join(out_dir, "*_s*.json")):
        name = os.path.basename(p)[: -len(".json")]
        impl, _, seed = name.rpartition("_s")
        if impl not in IMPLS:
            continue  # calibration files etc.
        with open(p) as f:
            r = json.load(f)
        if r.get("purity"):
            rows[(impl, int(seed))] = (r["purity"][0], r["nmi"][0])
    return rows


def main():
    subdir = sys.argv[1] if len(sys.argv) > 1 else ""
    out_dir = os.path.join(OUT_DIR, subdir) if subdir else OUT_DIR
    rows = load(out_dir)
    if not rows:
        print(f"no rows under {out_dir}")
        return

    impls = [i for i in IMPLS if any(k[0] == i for k in rows)]
    seeds = sorted({k[1] for k in rows})
    print("| seed | " + " | ".join(impls) + " |")
    print("|---" * (len(impls) + 1) + "|")
    for s in seeds:
        cells = []
        for i in impls:
            v = rows.get((i, s))
            cells.append(f"{v[0]:.3f} / {v[1]:.3f}" if v else "—")
        print(f"| {s} | " + " | ".join(cells) + " |")
    means = []
    for i in impls:
        vs = [rows[k] for k in rows if k[0] == i]
        p = [v[0] for v in vs]
        n = [v[1] for v in vs]
        ps = statistics.pstdev(p) if len(p) > 1 else 0.0
        ns = statistics.pstdev(n) if len(n) > 1 else 0.0
        means.append(
            f"**{statistics.fmean(p):.3f}±{ps:.3f} / "
            f"{statistics.fmean(n):.3f}±{ns:.3f}**"
        )
    print("| **mean±std** | " + " | ".join(means) + " |")
    print("\n(cells: purity / NMI; std = population std over seeds, ddof=0)")


if __name__ == "__main__":
    main()
