import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from nanorq_tpu.ops.pallas_kernels import gf2_matmul_pallas, gather_xor_pallas, gf256_matmul_pallas, companion_bits_blocked
rng = np.random.default_rng(0)
N = 50

def devloop(f, x0, n=N):
    # f: x -> x (same shape); chain n times inside one jit
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n, lambda i, a: f(a, i), x)
    o = run(x0); _ = np.asarray(o[0, :4])  # compile+sync
    t0 = time.time()
    o = run(x0); _ = np.asarray(o[0, :4])
    t1 = time.time()
    return (t1 - t0) / n

t = 40960
B = jnp.asarray(rng.integers(0,2,(256,256),dtype=np.uint8))
X0 = jnp.asarray(rng.integers(0,256,(256,t),dtype=np.uint8))
for tw in (1024, 2048, 4096):
    per = devloop(lambda a, i: gf2_matmul_pallas(B, a ^ i.astype(jnp.uint8), tw=tw), X0)
    print(f"gf2 [256,256]x{t} tw={tw}: {1e3*per:.3f}ms ({2*256*t/per/1e9:.0f} GB/s io)")
from nanorq_tpu.ops.gfmat import gf2_matmul
per = devloop(lambda a, i: gf2_matmul(B, a ^ i.astype(jnp.uint8)), X0)
print(f"XLA gf2: {1e3*per:.3f}ms")

S0 = jnp.asarray(rng.integers(0,256,(1072,t),dtype=np.uint8))
idx33 = jnp.asarray(rng.integers(0,1072,(1072, 33)).astype(np.int32))
per = devloop(lambda a, i: gather_xor_pallas(a ^ i.astype(jnp.uint8), idx33), S0)
print(f"gather pallas [1072x33]: {1e3*per:.3f}ms ({1072*33*t/per/1e9:.0f} GB/s gathered)")
from nanorq_tpu.ops.gfmat import xor_reduce_gather
per = devloop(lambda a, i: xor_reduce_gather(a ^ i.astype(jnp.uint8), idx33), S0)
print(f"gather XLA   [1072x33]: {1e3*per:.3f}ms ({1072*33*t/per/1e9:.0f} GB/s gathered)")

Mv = jnp.asarray(companion_bits_blocked(rng.integers(0,256,(128, 128),dtype=np.uint8), 128))
X1 = jnp.asarray(rng.integers(0,256,(128,t),dtype=np.uint8))
per = devloop(lambda a, i: gf256_matmul_pallas(Mv, a ^ i.astype(jnp.uint8), kb=128), X1)
print(f"gf256 vinv [128x128]: {1e3*per:.3f}ms")
Mh = jnp.asarray(companion_bits_blocked(rng.integers(0,256,(16, 1280),dtype=np.uint8), 1280))
# out [16,t] != in shape; pad via broadcast: feed fixed X but vary with i
X2 = jnp.asarray(rng.integers(0,256,(1280,t),dtype=np.uint8))
@jax.jit
def runh(x):
    def body(i, a):
        o = gf256_matmul_pallas(Mh, x ^ a[0,0] ^ i.astype(jnp.uint8), kb=1280)
        return a ^ o[:16]
    return jax.lax.fori_loop(0, N, body, jnp.zeros((16, t), jnp.uint8))
o = runh(X2); _=np.asarray(o[0,:4]); t0=time.time(); o=runh(X2); _=np.asarray(o[0,:4])
print(f"gf256 mhd [16x1280]: {1e3*(time.time()-t0)/N:.3f}ms")
