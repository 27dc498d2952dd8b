# Find the src-size cliff for gather throughput (VMEM promotion hypothesis)
import time

import jax
import jax.numpy as jnp
import numpy as np

from nanorq_tpu.ops.pallas_kernels import gather_xor_pallas

rng = np.random.default_rng(0)
N = 40


def timeit(fn, x0):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, N, fn, x)

    o = loop(x0)
    _ = np.asarray(o[0, :4])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        o = loop(x0)
        _ = np.asarray(o[0, :4])
        best = min(best, time.time() - t0 - 0.035)
    return best / N


t = 5120
n, w = 512, 8
for S in (1024, 2048, 4096, 8192, 12288, 16384, 20480, 24576, 32768, 57344):
    src = jnp.asarray(rng.integers(0, 256, (S, t), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, S, (n, w)).astype(np.int32))
    per = timeit(lambda i, a: a.at[:n].set(gather_xor_pallas(a, idx, tw=t)), src)
    mb = S * t / 1e6
    print(f"S={S} ({mb:.0f} MB): {1e3*per:.3f}ms ({n*w*t/per/1e9:.0f} GB/s)")
