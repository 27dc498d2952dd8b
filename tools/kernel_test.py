import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.ops.pallas_kernels import gf2_matmul_pallas, gf256_matmul_pallas, gather_xor_pallas, companion_bits_blocked
from nanorq_tpu.gf256.bitplane import gf2_matmul_bytes
from nanorq_tpu.gf256.numpy_ops import gf_matmul

rng = np.random.default_rng(0)
def bench(f, argsets, n=12):
    o = f(*argsets[0]); jax.block_until_ready(o)
    t0=time.time()
    outs=[f(*argsets[i % len(argsets)]) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.time()-t0)/n

t = 32*1280  # 40960
# correctness
Xs = rng.integers(0,256,(256, 2048),dtype=np.uint8)
B = rng.integers(0,2,(256,256),dtype=np.uint8)
got = np.asarray(gf2_matmul_pallas(jnp.asarray(B), jnp.asarray(Xs)))
print("gf2 pallas correct:", np.array_equal(got, gf2_matmul_bytes(B, Xs)))

M = rng.integers(0,256,(16, 256),dtype=np.uint8)
Mb = companion_bits_blocked(M, 256)
got = np.asarray(gf256_matmul_pallas(jnp.asarray(Mb), jnp.asarray(Xs), kb=256))
print("gf256 pallas correct:", np.array_equal(got, gf_matmul(M, Xs)))

S = rng.integers(0,256,(1072, 2048),dtype=np.uint8)
idx = rng.integers(0,1072,(1024, 16)).astype(np.int32)
got = np.asarray(gather_xor_pallas(jnp.asarray(S), jnp.asarray(idx)))
want = np.bitwise_xor.reduce(S[idx], axis=1)
print("gather pallas correct:", np.array_equal(got, want))

# perf
Xw = [jnp.asarray(rng.integers(0,256,(256,t),dtype=np.uint8)) for _ in range(4)]
Bj = jnp.asarray(B)
per = bench(gf2_matmul_pallas, [(Bj, X) for X in Xw])
print(f"gf2 [256,256]x{t}: {1e3*per:.3f}ms ({256*t/per/1e9:.0f} GB/s out)")
Mbig = companion_bits_blocked(rng.integers(0,256,(16, 1280),dtype=np.uint8), 1280)
Xbig = [jnp.asarray(rng.integers(0,256,(1280,t),dtype=np.uint8)) for _ in range(4)]
import functools
g256 = functools.partial(gf256_matmul_pallas, kb=1280)
per = bench(lambda M_, X_: gf256_matmul_pallas(M_, X_, kb=1280), [(jnp.asarray(Mbig), X) for X in Xbig])
print(f"gf256 mhd [16x1280]x{t}: {1e3*per:.3f}ms")
Mv = companion_bits_blocked(rng.integers(0,256,(128, 128),dtype=np.uint8), 128)
Xv = [jnp.asarray(rng.integers(0,256,(128,t),dtype=np.uint8)) for _ in range(4)]
per = bench(lambda M_, X_: gf256_matmul_pallas(M_, X_, kb=128), [(jnp.asarray(Mv), X) for X in Xv])
print(f"gf256 vinv [128x128]x{t}: {1e3*per:.3f}ms")
Sw = [jnp.asarray(rng.integers(0,256,(1072,t),dtype=np.uint8)) for _ in range(4)]
idxj = jnp.asarray(idx)
per = bench(gather_xor_pallas, [(S_, idxj) for S_ in Sw])
print(f"gather [1024x16]x{t}: {1e3*per:.3f}ms -> {1024*16*t/per/1e9:.0f} GB/s gathered")
idx33 = jnp.asarray(rng.integers(0,1072,(1024, 33)).astype(np.int32))
per = bench(gather_xor_pallas, [(S_, idx33) for S_ in Sw])
print(f"gather [1024x33]x{t}: {1e3*per:.3f}ms -> {1024*33*t/per/1e9:.0f} GB/s gathered")
