import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.precode.solver import _solve_core
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.device_schedule import compile_device
from nanorq_tpu.ops.replay import device_arrays, _trisolve, replay_device
from nanorq_tpu.ops.gfmat import gf256_matmul_bits, apply_bucket

rng = np.random.default_rng(0)
def bench(f, argsets, n=12):
    o = f(*argsets[0]); jax.block_until_ready(o)
    t0=time.time()
    outs=[f(*argsets[i % len(argsets)]) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.time()-t0)/n

K = 1000
P = params_init(K)
st = _solve_core(P, binary_rows(P))
ds = compile_device(st, CB=256)
arr = device_arrays(ds)
T = 1280; B = 32; t = B*T
print(f"Lpad={ds.Lpad} u_pad={ds.u_pad} nchunks={ds.nchunks} bsel_buckets={[b.idx.shape for b in ds.bsel]} ut={[b.idx.shape for b in ds.ut]}")
for q,ch in enumerate(ds.tdeps): print(f"chunk{q}: {[b.idx.shape for b in ch]}")

ys = [jnp.asarray(rng.integers(0,256,(ds.Lpad,t),dtype=np.uint8)) for _ in range(4)]
tri = jax.jit(lambda y: _trisolve(arr, y))
print(f"trisolve: {1e3*bench(tri, [(y,) for y in ys]):.2f}ms")

zs = [jnp.asarray(rng.integers(0,256,(ds.Lpad+1,t),dtype=np.uint8)) for _ in range(4)]
mhd = jax.jit(lambda z: gf256_matmul_bits(arr["mhd_bits"], z[:ds.Lpad]))
print(f"mhd matmul [{ds.mhd_bits.shape}]: {1e3*bench(mhd, [(z,) for z in zs]):.2f}ms")
zu = [jnp.asarray(rng.integers(0,256,(ds.u_pad,t),dtype=np.uint8)) for _ in range(4)]
vin = jax.jit(lambda z: gf256_matmul_bits(arr["vinv_bits"], z))
print(f"vinv matmul [{ds.vinv_bits.shape}]: {1e3*bench(vin, [(z,) for z in zu]):.2f}ms")

wt = jax.jit(lambda z, w: [apply_bucket(z, w, s, i) for s, i in arr["ut"]][-1])
ws = [jnp.asarray(rng.integers(0,256,(ds.Lpad+1,t),dtype=np.uint8)) for _ in range(4)]
xue = [jnp.asarray(rng.integers(0,256,(ds.u_pad+1,t),dtype=np.uint8)) for _ in range(4)]
print(f"ut buckets: {1e3*bench(wt, list(zip(xue, ws))):.2f}ms")

Ds = [None]*4
for v in range(4):
    Dn = np.zeros((ds.M_pad, t), np.uint8); Dn[:K] = rng.integers(0,256,(K,t),dtype=np.uint8)
    Ds[v] = jnp.asarray(Dn)
rep = lambda D: replay_device(arr, D)
print(f"full replay: {1e3*bench(rep, [(D,) for D in Ds]):.2f}ms")
