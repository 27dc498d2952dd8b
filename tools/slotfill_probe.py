#!/usr/bin/env python3
"""Trisolve gather slot-fill analysis (CPU-only): decompose the padding in
the staircase gather plan and model alternative width grids.

The gathers are DMA-issue-rate-bound (~12 ns per gathered row-slot,
BENCH_NOTES), so modeled slot count is the cost proxy.  Measured on the
real K=50000 encoder plan (2026-08-18):

    pow2 (default): slots 562432 fill 0.489 launches 336
      width-waste 48.3% (w=256 ranges quantize degree-130..200 heavy rows)
      rowpad-waste 2.8%
    hybrid64:       slots 507648 fill 0.542 launches 335   (-10% slots)
    hybrid64+RP384: slots 450176 fill 0.611 launches 438   (-20%, +30% launches)

Shrinking segment windows instead barely helps (NANORQ_TRI_SP=1: 90
segments, fill 0.513) — the waste is intra-range width quantization, not
cross-chunk maxima.  A flat per-chunk edge gather would reach 0.92 fill
but needs a variable-length segmented XOR-reduce the TPU has no cheap
primitive for (a [CB, m] GF(2) matmul per scan step costs more than the
padding saves; per-slot conditional DMA was measured 0.60x — BENCH_NOTES
rejected experiments).

Usage: python tools/slotfill_probe.py [K ...]   (forces CPU platform)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nanorq_tpu.precode.device_schedule as dsmod
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.solver import solve_state
from nanorq_tpu.rfc.params import params_init


def analyze(ds):
    tot = used = w_waste = r_waste = launch = 0
    by_w = {}
    for seg in ds.tri:
        for (a, b, idx) in seg.ranges:
            nq, rlen, w = idx.shape
            pad = 8 if rlen <= 8 else (16 if rlen <= 16 else -(-rlen // 32) * 32)
            tot += nq * pad * w
            real = (idx != ds.Lpad).sum(axis=2)
            used += int(real.sum())
            w_waste += int((w - real).sum())
            r_waste += nq * (pad - rlen) * w
            launch += nq
            by_w[w] = by_w.get(w, 0) + nq * pad * w
    return tot, used, w_waste, r_waste, launch, by_w


def main():
    ks = [int(a) for a in sys.argv[1:]] or [50000]
    for K in ks:
        P = params_init(K)
        st = solve_state(P, binary_rows(P))
        for name, grid in [("pow2", dsmod._WQ_GRIDS["pow2"]), ("hybrid64", dsmod._WQ_GRIDS["hybrid64"])]:
            dsmod.WIDTH_GRID = tuple(grid)
            ds = dsmod.compile_device(st)
            tot, used, ww, rw, launch, by_w = analyze(ds)
            print(
                f"K={K} {name}: slots {tot} fill {used/tot:.3f} launches {launch} "
                f"segs {len(ds.tri)}  width-waste {ww/tot:.1%} rowpad {rw/tot:.1%}"
            )
            print("   slots by width:", dict(sorted(by_w.items())))


if __name__ == "__main__":
    main()
