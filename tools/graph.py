#!/usr/bin/env python3
"""Render graph.png from a driver-captured bench JSON — the analog of the
reference's graph.awk + graph.gnuplot pipeline (Makefile:35-45, graph.png).

    python tools/graph.py BENCH_r03.json [out.png]

Grouped bars: this framework's encode / decode throughput per K next to the
reference's precalc-encode / decode-oh5 single-core numbers (linear scale,
zero-based bars).  Two-series categorical palette, identity by hue
with a legend; values labeled directly on the framework bars.
"""

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import REF_BASELINE  # single source of the reference numbers

# Mb/s (precalc encode, decode @6% loss + 5% overhead)
REF = {str(k): (v["precalc"], v["decode_oh5"]) for k, v in REF_BASELINE.items()}

INK = "#33302e"
MUTED = "#6e6862"
GRID = "#e3dfdb"
C_TPU = "#2a78d6"   # categorical slot 1 (blue)
C_REF = "#eb6834"   # categorical slot 2 (orange)


def load_capture(src):
    """Load a bench JSON; a FAILED driver capture (parsed == null, e.g. the
    r4 device-unreachable run) falls back to the newest non-null BENCH_r*.json
    with a warning, and exits 0 (no-op) if none exists."""
    import glob

    candidates = [src] + sorted(
        (p for p in glob.glob("BENCH_r*.json") if p != src), reverse=True
    )
    for path in candidates:
        text = open(path).read().strip()
        try:  # driver capture: wrapper object with the bench line under "parsed"
            rec = json.loads(text)
            rec = rec.get("parsed", rec) if isinstance(rec, dict) else rec
        except json.JSONDecodeError:  # raw bench stdout: last line is the JSON
            rec = json.loads(text.splitlines()[-1])
        if rec is None or "detail" not in rec:
            print(f"WARNING: {path} is a failed capture (parsed: null) — skipping")
            continue
        if path != src:
            print(f"using {path} instead of failed {src}")
        return rec, path
    print("no usable bench capture found — nothing to do")
    raise SystemExit(0)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r03.json"
    out = sys.argv[2] if len(sys.argv) > 2 else "graph.png"
    rec, src = load_capture(src)
    det = rec["detail"]
    ks = sorted((k for k in det if k in REF), key=int)

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2), dpi=160, sharey=True)
    fig.patch.set_facecolor("white")
    x = np.arange(len(ks))
    width = 0.38

    # decode panel: the honest fresh-pattern decode_e2e when captured (the
    # reference decode-oh5 times its per-run invert too), else warm decode
    dec = lambda r: r.get("decode_e2e") or r.get("decode") or 0.0
    e2e = any("decode_e2e" in det[k] for k in ks)
    panels = [
        ("encode (precalc)", [det[k]["encode"] for k in ks], [REF[k][0] / 1e3 for k in ks]),
        ("decode @6% loss + 5% overhead" + (" (fresh patterns)" if e2e else ""),
         [dec(det[k]) for k in ks], [REF[k][1] / 1e3 for k in ks]),
    ]
    for ax, (title, ours, ref) in zip(axes, panels):
        ax.set_facecolor("white")
        b1 = ax.bar(x - width / 2, ours, width * 0.94, color=C_TPU, zorder=3)
        ax.bar(x + width / 2, ref, width * 0.94, color=C_REF, zorder=3)
        for r, v in zip(b1, ours):
            ax.annotate(f"{v:.1f}", (r.get_x() + r.get_width() / 2, v),
                        textcoords="offset points", xytext=(0, 3),
                        ha="center", fontsize=7.5, color=INK)
        ax.set_title(title, fontsize=10, color=INK, pad=8)
        ax.set_xticks(x, ks)
        ax.tick_params(colors=MUTED, labelsize=8.5)
        ax.set_xlabel("K (symbols per block, T=1280)", fontsize=8.5, color=MUTED)
        ax.grid(axis="y", color=GRID, linewidth=0.7, zorder=0)
        for s in ("top", "right", "left"):
            ax.spines[s].set_visible(False)
        ax.spines["bottom"].set_color(GRID)
    axes[0].set_ylabel("throughput (Gbps)", fontsize=8.5, color=MUTED)
    fig.legend(
        handles=[plt.Rectangle((0, 0), 1, 1, color=C_TPU),
                 plt.Rectangle((0, 0), 1, 1, color=C_REF)],
        labels=["nanorq_tpu (1x TPU v5e chip)", "reference nanorq (1 core, i5-8400)"],
        loc="upper center", ncol=2, frameon=False, fontsize=9,
        bbox_to_anchor=(0.5, 1.02), labelcolor=INK,
    )
    fig.suptitle("")
    fig.text(0.995, 0.005, f"source: {src}", ha="right", va="bottom",
             fontsize=7, color=MUTED)
    fig.tight_layout(rect=(0, 0.02, 1, 0.93))
    fig.savefig(out, facecolor="white")
    print(f"wrote {out} from {src}")


if __name__ == "__main__":
    main()
