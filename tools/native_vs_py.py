import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.precode.solver import _solve_core
from nanorq_tpu.native import solve_native
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.device_schedule import compile_device
from nanorq_tpu.ops.replay import device_arrays, _replay_jit

K, T, B, N = 1000, 1280, 32, 40
P = params_init(K)
rc = binary_rows(P)
rng = np.random.default_rng(0)
for name, st in (("python", _solve_core(P, rc)), ("native", solve_native(P, rc))):
    ds = compile_device(st, CB=256)
    print(f"{name}: i={ds.i} u={ds.u} u_pad={ds.u_pad}")
    for q, gp in enumerate(ds.tdeps):
        print(f"  chunk{q}: passes={[p.shape for p in gp.passes]} ov={[ix.shape for ix,_ in gp.overflow]}")
    print(f"  bsel passes={[p.shape for p in ds.bsel.passes]} ov={[ix.shape for ix,_ in ds.bsel.overflow]}")
    print(f"  ut passes={[p.shape for p in ds.ut.passes]} ov={[ix.shape for ix,_ in ds.ut.overflow]}")
    arr = device_arrays(ds); a = dict(arr); pall = a.pop("pallas")
    t2 = B*T
    Dn = np.zeros((ds.M_pad, t2), np.uint8); Dn[:K] = rng.integers(0,256,(K,t2),dtype=np.uint8)
    Dj = jnp.asarray(Dn)
    @jax.jit
    def loop(Dx):
        def body(i, Dcur):
            C = _replay_jit(a, Dcur, pall)
            return Dcur.at[:P.L].set(C)
        return jax.lax.fori_loop(0, N, body, Dx)
    t0=time.time(); o=loop(Dj); _=np.asarray(o[0,:4]); print(f"  compile {time.time()-t0:.0f}s")
    t0=time.time(); o=loop(Dj); _=np.asarray(o[0,:4]); per=(time.time()-t0-0.035)/N
    print(f"  replay {1e3*per:.2f}ms -> {8*K*T*B/per/1e9:.1f} Gbps")
