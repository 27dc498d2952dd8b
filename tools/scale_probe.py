import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.precode.solver import _solve_core
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.device_schedule import compile_device
from nanorq_tpu.ops.replay import device_arrays, _replay_jit
from nanorq_tpu.ops.lt import lt_plan, lt_combine

rng = np.random.default_rng(0)
T = 1280
K = 1000
P = params_init(K)
st = _solve_core(P, binary_rows(P))
ds = compile_device(st, CB=256)
arr = device_arrays(ds); a = dict(arr); pall = a.pop("pallas")
plan = lt_plan(np.arange(P.Kp, dtype=np.uint32), P)
for B, N in [(64, 30), (128, 20), (256, 10)]:
    t = B*T
    Dn = np.zeros((ds.M_pad, t), np.uint8); Dn[:K] = rng.integers(0,256,(K,t),dtype=np.uint8)
    Dj = jnp.asarray(Dn)
    @jax.jit
    def loop(Dx):
        def body(i, Dcur):
            C = _replay_jit(a, Dcur, pall)
            s = lt_combine(C, plan)
            return Dcur.at[:plan.n_pad].set(s)
        return jax.lax.fori_loop(0, N, body, Dx)
    t0=time.time(); o = loop(Dj); _=np.asarray(o[0,:4]); c=time.time()-t0
    t0=time.time(); o = loop(Dj); _=np.asarray(o[0,:4]); per=(time.time()-t0-0.035)/N
    payload = K*T*B
    print(f"K={K} B={B}: replay+lt {1e3*per:.1f}ms -> {8*payload/per/1e9:.1f} Gbps (compile {c:.0f}s)")
