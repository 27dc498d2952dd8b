#!/usr/bin/env python3
"""Render bench.py JSON output (or BENCH_r*.json) as a comparison table —
the analog of the reference's graph.awk/graph.gnuplot chart pipeline.

    python bench.py --full 2>/dev/null | python tools/bench_table.py
    python tools/bench_table.py BENCH_r1.json
"""

import json
import sys

REF = {  # Mb/s, BASELINE.md
    "100": (10200, 5800), "500": (8200, 6750), "1000": (7900, 6600),
    "5000": (5900, 5000), "10000": (4050, 3550), "50000": (2100, 1950),
}


def main():
    blob = open(sys.argv[1]).read() if len(sys.argv) > 1 else sys.stdin.read()
    rec = json.loads(blob.strip().splitlines()[-1])
    det = rec.get("detail", {})
    print(f"{'K':>7} {'enc Gbps':>9} {'ref':>6} {'x':>5} {'dec Gbps':>9} {'ref':>6} {'x':>5} {'agg':>6}")
    for k in sorted(det, key=int):
        r = det[k]
        re_, rd = REF.get(k, (None, None))
        ex = f"{r['encode']/ (re_/1e3):.1f}x" if re_ else "-"
        dx = f"{r['decode']/ (rd/1e3):.1f}x" if rd else "-"
        print(
            f"{k:>7} {r['encode']:>9.2f} {re_/1e3 if re_ else 0:>6.2f} {ex:>5} "
            f"{r['decode']:>9.2f} {rd/1e3 if rd else 0:>6.2f} {dx:>5} {r['agg']:>6.2f}"
        )
    print(f"\nheadline: {rec['metric']} = {rec['value']} {rec['unit']} "
          f"({rec['vs_baseline']}x baseline)")


if __name__ == "__main__":
    main()
