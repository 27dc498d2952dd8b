# K=10000 on TPU: correctness + perf with scan trisolve
import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.codec.cache import encoder_schedule
from nanorq_tpu.ops.replay import device_arrays, _replay_jit
from nanorq_tpu.ops.lt import lt_plan, lt_combine
from nanorq_tpu.precode.device_schedule import replay_structured_numpy

K, T, B = 10000, 1280, 16
P = params_init(K)
t0=time.time(); ds = encoder_schedule(P.Kp); print(f"solve+compile: {time.time()-t0:.1f}s nchunks={ds.nchunks} u={ds.u} segs={[[(a, b, ix.shape[2]) for a, b, ix in seg.ranges] for seg in ds.tri]}")
arr = device_arrays(ds); a = dict(arr); pall = a.pop("pallas")
rng = np.random.default_rng(0)
# correctness (small width, numpy oracle)
Dm = np.zeros((ds.M_pad, 128), np.uint8); Dm[:K] = rng.integers(0,256,(K,128),dtype=np.uint8)
t0=time.time()
Cd = np.asarray(_replay_jit(a, jnp.asarray(Dm), pall))
print(f"tpu compile+run: {time.time()-t0:.1f}s")
Cn = replay_structured_numpy(Dm, ds)
print("K=10000 replay correct:", np.array_equal(Cd, Cn))
# perf
t = B*T
Dn = np.zeros((ds.M_pad, t), np.uint8); Dn[:K] = rng.integers(0,256,(K,t),dtype=np.uint8)
Dj = jnp.asarray(Dn)
plan = lt_plan(np.arange(P.Kp, dtype=np.uint32), P)
N = 10
@jax.jit
def loop(Dx):
    def body(i, Dc):
        C = _replay_jit(a, Dc, pall)
        s = lt_combine(C, plan)
        return Dc.at[:K].set(s[:K])
    return jax.lax.fori_loop(0, N, body, Dx)
t0=time.time(); o=loop(Dj); _=np.asarray(o[0,:4]); print(f"loop compile: {time.time()-t0:.0f}s")
t0=time.time(); o=loop(Dj); _=np.asarray(o[0,:4]); per=(time.time()-t0-0.035)/N
print(f"K=10000 B={B}: replay+lt {1e3*per:.1f}ms -> {8*K*T*B/per/1e9:.1f} Gbps")
