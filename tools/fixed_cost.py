import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.codec.cache import encoder_schedule
from nanorq_tpu.ops.replay import device_arrays, _replay_jit

K, T, B = 1000, 1280, 32
P = params_init(K)
ds = encoder_schedule(P.Kp)
arr = device_arrays(ds); a = dict(arr); pall = a.pop("pallas")
rng = np.random.default_rng(0)
Dn = np.zeros((ds.M_pad, B*T), np.uint8); Dn[:K] = rng.integers(0,256,(K,B*T),dtype=np.uint8)
Dj = jnp.asarray(Dn)
for n in (20, 20, 40, 40, 20):
    @jax.jit
    def run(x, n=n):
        return jax.lax.fori_loop(0, n, lambda i, Dc: Dc.at[:P.L].set(_replay_jit(a, Dc, pall)), x)
    t0=time.time(); o=run(Dj); _=np.asarray(o[0,:4]); c = time.time()-t0
    times = []
    for rep in range(3):
        t0=time.time(); o=run(Dj); _=np.asarray(o[0,:4]); times.append(time.time()-t0)
    print(f"n={n}: compile+1st {c:.1f}s timed totals: {['%.3f'%x for x in times]} -> per-iter {['%.1fms'%(1e3*x/n) for x in times]}")
