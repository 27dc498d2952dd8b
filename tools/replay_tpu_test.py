import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.precode.solver import _solve_core, state_to_schedule
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.schedule import replay_numpy
from nanorq_tpu.precode.device_schedule import compile_device
from nanorq_tpu.ops.replay import device_arrays, _replay_jit
from nanorq_tpu.ops.lt import lt_plan, lt_combine

K = 1000
P = params_init(K)
st = _solve_core(P, binary_rows(P))
S = state_to_schedule(st)
ds = compile_device(st, CB=256)
arr = device_arrays(ds)
a = dict(arr); pall = a.pop("pallas")
rng = np.random.default_rng(0)
T = 1280
B = 32
t = B*T
t0=time.time()
Dn = np.zeros((ds.M_pad, t), np.uint8); Dn[:K] = rng.integers(0,256,(K,t),dtype=np.uint8)
Dj = jnp.asarray(Dn)
C = np.asarray(_replay_jit(a, Dj, pall))
print(f"compile+run: {time.time()-t0:.1f}s")
Cref = replay_numpy(Dn[:S.n_rows].copy(), S)
print("pallas replay correct:", np.array_equal(C, Cref))
plan = lt_plan(np.arange(P.Kp, dtype=np.uint32), P)
t0=time.time()
sym = np.asarray(lt_combine(jnp.asarray(C), plan))
print(f"lt compile+run: {time.time()-t0:.1f}s; systematic:", np.array_equal(sym[:K], Dn[:K]))

N = 40
@jax.jit
def loop(Dx):
    def body(i, Dcur):
        C = _replay_jit(a, Dcur, pall)
        return Dcur.at[:P.L].set(C)
    return jax.lax.fori_loop(0, N, body, Dx)
t0=time.time(); o = loop(Dj); _=np.asarray(o[0,:4]); print(f"loop compile: {time.time()-t0:.1f}s")
t0=time.time(); o = loop(Dj); _=np.asarray(o[0,:4]); per=(time.time()-t0-0.035)/N
payload = K*T*B
print(f"B={B}: replay {1e3*per:.2f}ms -> {8*payload/per/1e9:.1f} Gbps")
Cj = _replay_jit(a, Dj, pall)
@jax.jit
def loop2(Cx):
    def body(i, Ccur):
        s = lt_combine(Ccur, plan)
        return Ccur.at[:plan.n_pad].set(s)
    return jax.lax.fori_loop(0, N, body, Cx)
t0=time.time(); o = loop2(Cj); _=np.asarray(o[0,:4]); print(f"lt loop compile: {time.time()-t0:.1f}s")
t0=time.time(); o=loop2(Cj); _=np.asarray(o[0,:4]); per=(time.time()-t0-0.035)/N
print(f"B={B}: lt     {1e3*per:.2f}ms -> {8*payload/per/1e9:.1f} Gbps")
