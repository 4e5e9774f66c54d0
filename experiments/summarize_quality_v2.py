"""Render the non-saturating quality study (run_quality_v2.py output) as a
markdown table + per-impl means for the study README / PARITY.md.

Usage: python experiments/summarize_quality_v2.py
"""

import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "results", "attn_dtype_quality_v2")
IMPLS = ("ctrl", "xla_bf16", "xla_bf16s", "bf16h")
SEEDS = (0, 1, 2, 3)


def main():
    rows = {}
    for p in glob.glob(os.path.join(OUT_DIR, "*_s*.json")):
        name = os.path.basename(p)[: -len(".json")]
        impl, _, seed = name.rpartition("_s")
        with open(p) as f:
            r = json.load(f)
        if r.get("purity"):
            rows[(impl, int(seed))] = (r["purity"][0], r["nmi"][0])

    impls = [i for i in IMPLS if any(k[0] == i for k in rows)]
    print("| seed | " + " | ".join(impls) + " |")
    print("|---" * (len(impls) + 1) + "|")
    for s in SEEDS:
        cells = []
        for i in impls:
            v = rows.get((i, s))
            cells.append(f"{v[0]:.3f} / {v[1]:.3f}" if v else "—")
        print(f"| {s} | " + " | ".join(cells) + " |")
    means = []
    for i in impls:
        vs = [rows[k] for k in rows if k[0] == i]
        p = sum(v[0] for v in vs) / len(vs)
        n = sum(v[1] for v in vs) / len(vs)
        means.append(f"**{p:.3f} / {n:.3f}**")
    print("| **mean** | " + " | ".join(means) + " |")
    print("\n(cells: purity / NMI)")


if __name__ == "__main__":
    main()
