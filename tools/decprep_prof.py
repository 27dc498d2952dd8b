#!/usr/bin/env python3
"""Reproducible per-pattern decode host-prep table (BENCH_NOTES.md source).

For each K: warm the per-K' caches, then time the three prep phases on
fresh 6%-loss + 5%-overhead patterns (min over N) exactly as decoder_plan
runs them: patched rows (CSR splice), factorization solve (native GE), and
plan build (W rows for the dense path / device-schedule compile for the
structured path).

    python tools/decprep_prof.py [K ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pattern(P, K, seed):
    rng = np.random.default_rng(seed)
    gaps = np.nonzero(rng.random(K) < 0.06)[0]
    ov = max(1, int(0.05 * K))
    isis = np.arange(P.Kp + ov, dtype=np.uint32)
    rep = (np.arange(K, K + gaps.size + ov) + (P.Kp - K)).astype(np.uint32)
    isis[gaps] = rep[: gaps.size]
    isis[P.Kp :] = rep[gaps.size :]
    return gaps, isis, ov


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.ops.wpath import w_rows_gf2
    from nanorq_tpu.precode.device_schedule import _pad_rows, compile_device
    from nanorq_tpu.precode.matrix import lt_rows_csr
    from nanorq_tpu.precode.solver import solve_state
    from nanorq_tpu.rfc.params import params_init

    from nanorq_tpu.precode.device_schedule import _FREEZE_AFTER

    ks = [int(a) for a in sys.argv[1:]] or [1000, 5000, 10000, 50000]
    print("| K | plan | rows | solve | W/plan build | total |")
    print("|---|---|---|---|---|---|")
    for K in ks:
        P = params_init(K)
        g0, i0, ov = pattern(P, K, 99)
        cc.decoder_plan(P, i0, ov)  # warm per-K' caches (rows base, tables)
        wpath = P.Kp <= cc.WPATH_MAX_KP
        if not wpath:
            # walk past the canonical-layout freeze AND the early growth
            # events so the structured rows measure the steady-state
            # frozen-layout fill (convergence takes ~6-10 patterns at
            # K=50000), not warm-up DP or a re-freeze
            for s in range(_FREEZE_AFTER + 8):
                _, iw, ovw = pattern(P, K, 31000 + s)
                cc.decoder_plan(P, iw, ovw)
        best = {"rows": 9e9, "solve": 9e9, "plan": 9e9, "total": 9e9}
        for s in range(5):
            gaps, isis, ovh = pattern(P, K, 7000 + s)
            t00 = time.time()
            t0 = time.time()
            rows = cc._patched_rows(P, isis, ovh)
            t_rows = time.time() - t0
            t0 = time.time()
            st = solve_state(P, rows, ovh)
            t_solve = time.time() - t0
            t0 = time.time()
            # mirror codec.cache.decoder_plan's path selection exactly
            if wpath and not st.hdpc_used:
                M_pad = _pad_rows(st.M + 1)
                out_rows = lt_rows_csr(gaps.astype(np.uint32), P)
                w_rows_gf2(st, out_rows, zero_row=M_pad - 1)
            elif st.hdpc_used and P.Kp <= cc.WPATH_GF256_MAX_KP:
                from nanorq_tpu.ops.wpath import w_rows

                M_pad = _pad_rows(st.M + 1)
                out_rows = lt_rows_csr(gaps.astype(np.uint32), P)
                w_rows(st, out_rows, n_cols=M_pad)
            else:
                compile_device(st, canonical=True)
            t_plan = time.time() - t0
            for k, v in dict(rows=t_rows, solve=t_solve, plan=t_plan,
                             total=time.time() - t00).items():
                best[k] = min(best[k], v)
        kind = "dense-W" if wpath else "structured"
        print(
            f"| {K} | {kind} | {best['rows']*1e3:.1f} ms | {best['solve']*1e3:.1f} ms "
            f"| {best['plan']*1e3:.1f} ms | ~{best['total']*1e3:.0f} ms |"
        )


if __name__ == "__main__":
    main()
