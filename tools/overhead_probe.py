import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.ops.pallas_kernels import gather_xor_pallas, gf2_matmul_pallas
rng = np.random.default_rng(0)
t = 40960
S = jnp.asarray(rng.integers(0,256,(1281,t),dtype=np.uint8))
N = 100
# tiny gather: 8 rows x 4 deps — nearly pure launch overhead
idx_s = jnp.asarray(rng.integers(0,1281,(8, 4)).astype(np.int32))
@jax.jit
def loop(x):
    def body(i, a):
        r = gather_xor_pallas(a, idx_s)
        return a.at[:8].set(r)
    return jax.lax.fori_loop(0, N, body, x)
o=loop(S); _=np.asarray(o[0,:4])
t0=time.time(); o=loop(S); _=np.asarray(o[0,:4]); print(f"tiny gather launch: {1e3*(time.time()-t0-0.035)/N:.3f}ms")
# medium gather 256x8
idx_m = jnp.asarray(rng.integers(0,1281,(256, 8)).astype(np.int32))
@jax.jit
def loop2(x):
    def body(i, a):
        r = gather_xor_pallas(a, idx_m)
        return a.at[:256].set(r)
    return jax.lax.fori_loop(0, N, body, x)
o=loop2(S); _=np.asarray(o[0,:4])
t0=time.time(); o=loop2(S); _=np.asarray(o[0,:4]); print(f"gather 256x8: {1e3*(time.time()-t0-0.035)/N:.3f}ms")
# xla scatter of 256 rows into 1281
vals = jnp.asarray(rng.integers(0,256,(256,t),dtype=np.uint8))
slots = jnp.asarray(rng.permutation(1281)[:256].astype(np.int32))
@jax.jit
def loop3(x):
    def body(i, a):
        return a.at[slots].set(jnp.take(a, slots, axis=0) ^ vals)
    return jax.lax.fori_loop(0, N, body, x)
o=loop3(S); _=np.asarray(o[0,:4])
t0=time.time(); o=loop3(S); _=np.asarray(o[0,:4]); print(f"xla scatter-xor 256rows: {1e3*(time.time()-t0-0.035)/N:.3f}ms")
# static dus
z = jnp.asarray(rng.integers(0,256,(256,t),dtype=np.uint8))
@jax.jit
def loop4(x):
    def body(i, a):
        return a.at[256:512].set(a[0:256] ^ z)
    return jax.lax.fori_loop(0, N, body, x)
o=loop4(S); _=np.asarray(o[0,:4])
t0=time.time(); o=loop4(S); _=np.asarray(o[0,:4]); print(f"static slice-set: {1e3*(time.time()-t0-0.035)/N:.3f}ms")
# gf2 matmul
bits = jnp.asarray(rng.integers(0,2,(256,256),dtype=np.uint8))
@jax.jit
def loop5(x):
    def body(i, a):
        return a.at[:256].set(gf2_matmul_pallas(bits, a[:256]))
    return jax.lax.fori_loop(0, N, body, x)
o=loop5(S); _=np.asarray(o[0,:4])
t0=time.time(); o=loop5(S); _=np.asarray(o[0,:4]); print(f"gf2 [256,256]: {1e3*(time.time()-t0-0.035)/N:.3f}ms")
