# GF(2) chunk-matmul A/B at replay shapes: pallas fused kernel vs plain XLA
# bit-plane matmul (gfmat.gf2_matmul), chained like the replay's scan.
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nanorq_tpu.gf256.bitplane import gf2_matmul_bytes
from nanorq_tpu.ops.gfmat import gf2_matmul
from nanorq_tpu.ops.pallas_kernels import gf2_matmul_pallas

import os

m = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
t = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
N = int(os.environ.get("N", "400"))

rng = np.random.default_rng(0)
bits_np = (rng.random((m, m)) < 0.5).astype(np.uint8)
x_np = rng.integers(0, 256, (m, t), dtype=np.uint8)
bits = jnp.asarray(bits_np)
x = jnp.asarray(x_np)
ref = gf2_matmul_bytes(bits_np, x_np)


def timeit(fn):
    @jax.jit
    def loop(x0):
        return jax.lax.fori_loop(0, N, lambda i, xc: fn(xc), x0)

    xc = loop(x)  # warm; each timed call consumes the previous output so no
    _ = np.asarray(xc[0, :4])  # two calls are identical (relay caches those)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        xc = loop(xc)
        _ = np.asarray(xc[0, :4])
        best = min(best, time.time() - t0 - 0.035)
    return best / N


for name, fn in (
    ("pallas", lambda xc: gf2_matmul_pallas(bits, xc)),
    ("pallas-tw128", lambda xc: gf2_matmul_pallas(bits, xc, tw=128)),
    ("xla", lambda xc: gf2_matmul(bits, xc)),
):
    got = np.asarray(fn(x))
    ok = np.array_equal(got, ref)
    per = timeit(fn)
    gmac = m * m * 8 * t / 1e9
    print(f"  {name}: {1e6*per:.0f}us  ({gmac/per/1e3:.0f} int8-TOPS eq, ok={ok})  [m={m} t={t}]")
