import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.precode.solver import _solve_core
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.device_schedule import compile_device
from nanorq_tpu.ops.replay import device_arrays, _trisolve, _apply_plan, _gf2mm, _gf256mm, take_rows, MHD_KB
from nanorq_tpu.ops.lt import lt_plan, lt_combine

rng = np.random.default_rng(0)
K, T, B = 1000, 1280, 64
t = B*T
P = params_init(K)
st = _solve_core(P, binary_rows(P))
ds = compile_device(st, CB=256)
arr = device_arrays(ds); a = dict(arr); pall = a.pop("pallas")
N = 30
def timed(f, x0, n=N):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n, f, x)
    o = run(x0); _=np.asarray(jax.tree.leaves(o)[0]).ravel()[:4]
    t0=time.time(); o=run(x0); _=np.asarray(jax.tree.leaves(o)[0]).ravel()[:4]
    return (time.time()-t0-0.035)/n

D = np.zeros((ds.M_pad, t), np.uint8); D[:K] = rng.integers(0,256,(K,t),dtype=np.uint8)
Dj = jnp.asarray(D)
y0 = jnp.asarray(rng.integers(0,256,(ds.Lpad, t),dtype=np.uint8))

per = timed(lambda i, Dc: Dc ^ jnp.broadcast_to(take_rows(pall, Dc, a["piv_rows"])[0], Dc.shape), Dj)
print(f"y take [Lpad={ds.Lpad}]: {1e3*per:.2f}ms")
per = timed(lambda i, yc: yc ^ _trisolve(a, yc, pall)[:ds.Lpad], y0)
print(f"trisolve: {1e3*per:.2f}ms")
zs0 = jnp.asarray(rng.integers(0,256,(ds.Lpad+1, t),dtype=np.uint8))
def bsel_body(i, zc):
    zsel = _apply_plan(pall, zc, a["bsel"], jnp.zeros((ds.u_pad, t), jnp.uint8))
    return zc.at[:ds.u_pad].set(zsel)
print(f"bsel: {1e3*timed(bsel_body, zs0):.2f}ms  shapes={[p.shape for p in ds.bsel.passes]} ov={[(ix.shape) for ix,_ in ds.bsel.overflow]}")
def mhd_body(i, zc):
    h = _gf256mm(pall, a["mhd_bits"], zc[:ds.Lpad], min(MHD_KB, ds.Lpad))
    return zc.at[:32].set(h)
print(f"mhd: {1e3*timed(mhd_body, zs0):.2f}ms")
xu0 = jnp.asarray(rng.integers(0,256,(ds.u_pad, t),dtype=np.uint8))
def vinv_body(i, xc):
    return _gf256mm(pall, a["vinv_bits"], xc, ds.u_pad)
print(f"vinv [{ds.u_pad}]: {1e3*timed(vinv_body, xu0):.2f}ms")
xue = jnp.asarray(rng.integers(0,256,(ds.u_pad+1, t),dtype=np.uint8))
def ut_body(i, yc):
    return _apply_plan(pall, xue, a["ut"], yc)
print(f"ut: {1e3*timed(ut_body, y0):.2f}ms  shapes={[p.shape for p in ds.ut.passes]} ov={[(ix.shape) for ix,_ in ds.ut.overflow]}")
# tdeps shapes
for q, gp in enumerate(ds.tdeps):
    print(f"  chunk{q}: passes={[p.shape for p in gp.passes]} ov={[ix.shape for ix,_ in gp.overflow]}")
plan = lt_plan(np.arange(P.Kp, dtype=np.uint32), P)
C0 = jnp.asarray(rng.integers(0,256,(P.L, t),dtype=np.uint8))
def lt_body(i, Cc):
    s = lt_combine(Cc, plan)
    return Cc.at[:plan.n_pad].set(s)
print(f"lt: {1e3*timed(lt_body, C0):.2f}ms  passes={[p.shape for p in plan.plan[0]]} ov={[ix.shape for ix,_ in plan.plan[1]]}")
