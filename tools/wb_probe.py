"""B sweep for the dense-W decode path (run on real TPU).

The structured replay's B (blocks per batch) is VMEM-carry-bound, but the
W matmul has no carry — this probe measures whether larger t = B*T lifts
the decode column at K=5000/10000 (bench DEFAULT_B is 8 there).

Usage: python tools/wb_probe.py [K ...]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nanorq_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

from nanorq_tpu.codec.cache import WSchedule, decoder_plan
from nanorq_tpu.ops.wpath import w_matmul_gf2
from nanorq_tpu.rfc.params import params_init


def timed(fn, x0, n=8):
    x = fn(x0)
    _ = np.asarray(x[0, :4])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        xc = x0
        for _ in range(n):
            xc = fn(xc)
        _ = np.asarray(xc[0, :4])
        best = min(best, (time.time() - t0 - 0.035) / n)
    return best


def main():
    ks = [int(a) for a in sys.argv[1:]] or [5000, 10000]
    T = 1280
    for K in ks:
        P = params_init(K)
        rng = np.random.default_rng(0)
        gaps = np.nonzero(rng.random(K) < 0.06)[0]
        ov = max(1, int(0.05 * K))
        isis = np.arange(P.Kp + ov, dtype=np.uint32)
        rep = (np.arange(K, K + gaps.size + ov) + (P.Kp - K)).astype(np.uint32)
        isis[gaps] = rep[: gaps.size]
        isis[P.Kp :] = rep[gaps.size :]
        plan = decoder_plan(P, isis, ov)
        assert isinstance(plan, WSchedule), "probe expects the dense-W plan"
        staged = plan.staged()
        for B in (4, 8, 16, 32):
            t = B * T
            D = np.zeros((plan.M_pad, t), np.uint8)
            D[:K] = rng.integers(0, 256, (K, t), dtype=np.uint8)
            Dj = jnp.asarray(D)

            def step(Dc):
                s = w_matmul_gf2(staged, Dc)
                return Dc.at[: gaps.size].set(s[: gaps.size])

            per = timed(step, Dj)
            print(
                f"K={K} B={B}: {per*1e3:.2f} ms/step, {8*K*T*B/per/1e9:.1f} Gbps",
                flush=True,
            )


if __name__ == "__main__":
    main()
