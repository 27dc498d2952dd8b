#!/usr/bin/env python3
"""Regenerate the README.md / BENCH_NOTES.md performance tables verbatim
from a driver-captured bench JSON (BENCH_r*.json) — the docs' numbers are
generation-locked to the captured artifact, never hand-edited.

    python tools/regen_docs.py BENCH_r03.json
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # for graph.load_capture
from bench import REF_BASELINE  # single source of the reference numbers

# Mb/s (encode, precalc, decode, decode_oh5)
REF = {
    str(k): (v["encode"], v["precalc"], v["decode"], v["decode_oh5"])
    for k, v in REF_BASELINE.items()
}

BEGIN = "<!-- BENCH_TABLE:BEGIN (tools/regen_docs.py) -->"
END = "<!-- BENCH_TABLE:END -->"


def _dec(r):
    """Honest decode column: fresh-pattern e2e when captured, else the warm
    device number (which can also be None when the publish guard dropped a
    degenerate cell)."""
    return r.get("decode_e2e") or r.get("decode")


def readme_table(det):
    rows = [
        "| K | encode Gbps (ref precalc) | fresh encode (ref encode) | decode @6% loss (ref) | decode 0% loss (ref) | agg x ref |",
        "|---|---|---|---|---|---|",
    ]
    for k in sorted(det, key=int):
        r = det[k]
        e, p, d0, doh = REF.get(k, (None,) * 4)  # off-grid K: no ref column
        ref = lambda v: "-" if v is None else f"{v/1e3:.2f}"
        fresh = f"**{r['encode_fresh']:.1f}**" if "encode_fresh" in r else "-"
        d = _dec(r)
        rows.append(
            f"| {k} | **{r['encode']:.1f}** ({ref(p)}) | {fresh} ({ref(e)}) "
            f"| {'**%.1f**' % d if d else '-'} ({ref(doh)}) | **{r['decode0']:.1f}** ({ref(d0)}) "
            f"| {r.get('vs_ref', 0):.1f}x |"
        )
    return "\n".join(rows)


def notes_table(det):
    rows = [
        "| K | encode | fresh | decode e2e @6% | decode warm | decode0 | agg e2e | vs ref | enc/dec prep ms | arms (res/host/dev) |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    fmt = lambda v, p=1: "-" if not v else f"{v:.{p}f}"
    for k in sorted(det, key=int):
        r = det[k]
        arms = (
            f"{fmt(r.get('e2e_res'))}/{fmt(r.get('e2e_host'))}/{fmt(r.get('e2e_device'))}"
            if "e2e_host" in r
            else "-"
        )
        rows.append(
            f"| {k} | {r['encode']:.1f} | {fmt(r.get('encode_fresh'))} | {fmt(r.get('decode_e2e'))} "
            f"| {fmt(r.get('decode'))} | {r['decode0']:.1f} | {fmt(r.get('agg_e2e') or r.get('agg'))} "
            f"| {r.get('vs_ref', 0):.2f}x "
            f"| {r['solve_ms']:.0f} / {r['dec_solve_ms']:.0f} | {arms} |"
        )
    return "\n".join(rows)


def splice(path, table, src_name):
    text = open(path).read()
    block = f"{BEGIN}\n{table}\n\n(All values Gbps, generated from `{src_name}`.)\n{END}"
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.S)
    if not pat.search(text):
        raise SystemExit(f"{path}: markers not found")
    open(path, "w").write(pat.sub(block, text))
    print(f"regenerated table in {path}")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r03.json"
    from graph import load_capture  # shared failed-capture fallback

    rec, src = load_capture(src)
    det = rec["detail"]
    splice("README.md", readme_table(det), src)
    splice("BENCH_NOTES.md", notes_table(det), src)
    print(
        f"headline: {rec['metric']} = {rec['value']} {rec['unit']} "
        f"({rec['vs_baseline']}x; grid min {rec.get('vs_baseline_min_over_grid')}x)"
    )


if __name__ == "__main__":
    main()
