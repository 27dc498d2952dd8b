# encode (replay + LT) throughput vs B (blocks per batch), per K
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nanorq_tpu.codec.cache import encoder_schedule
from nanorq_tpu.ops.lt import lt_combine, lt_plan
from nanorq_tpu.ops.replay import _replay_jit, device_arrays
from nanorq_tpu.rfc.params import params_init

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
Bs = [int(x) for x in sys.argv[2:]] or [4, 8, 16]
T = 1280
N = 8 if K >= 20000 else 20

P = params_init(K)
t0 = time.time()
ds = encoder_schedule(P.Kp)
print(f"K={K} solve: {time.time()-t0:.1f}s Lpad={ds.Lpad} CB={ds.CB} u={ds.u}")
arr = device_arrays(ds)
a = dict(arr)
pall = a.pop("pallas")
plan = lt_plan(np.arange(P.Kp, dtype=np.uint32), P)
rng = np.random.default_rng(0)

for B in Bs:
    t = B * T
    Dn = np.zeros((ds.M_pad, t), np.uint8)
    Dn[:K] = rng.integers(0, 256, (K, t), dtype=np.uint8)
    Dj = jnp.asarray(Dn)

    @jax.jit
    def loop_replay(Dx):
        def body(i, Dc):
            return Dc.at[: P.L].set(_replay_jit(a, Dc, pall))

        return jax.lax.fori_loop(0, N, body, Dx)

    @jax.jit
    def loop_full(Dx):
        def body(i, Dc):
            C = _replay_jit(a, Dc, pall)
            s = lt_combine(C, plan)
            return Dc.at[:K].set(s[:K])

        return jax.lax.fori_loop(0, N, body, Dx)

    res = {}
    for name, loop in (("replay", loop_replay), ("replay+lt", loop_full)):
        t0 = time.time()
        o = loop(Dj)
        _ = np.asarray(o[0, :4])
        comp = time.time() - t0
        best = float("inf")
        for _i in range(2):  # chained: no two relay calls identical
            t0 = time.time()
            o = loop(o)
            _ = np.asarray(o[0, :4])
            best = min(best, time.time() - t0 - 0.035)
        per = best / N
        res[name] = 8 * K * T * B / per / 1e9
        print(f"  K={K} B={B} {name}: {1e3*per:.1f}ms -> {res[name]:.2f} Gbps (compile {comp:.0f}s)")
