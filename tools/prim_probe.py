import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.ops.gfmat import gf2_matmul, xor_reduce_gather, unpack_planes, pack_planes

rng = np.random.default_rng(0)
def bench(f, argsets, n=20):
    o = f(*argsets[0]); jax.block_until_ready(o)
    t0=time.time()
    outs=[f(*argsets[i % len(argsets)]) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.time()-t0)/n

t = 8*1280
Xs = [jnp.asarray(rng.integers(0,256,(256,t),dtype=np.uint8)) for _ in range(4)]
bits = jnp.asarray(rng.integers(0,2,(256,256),dtype=np.uint8))
f = jax.jit(gf2_matmul)
print(f"gf2_matmul 256x256x{t}: {1e3*bench(f, [(bits, X) for X in Xs]):.3f}ms")

up = jax.jit(lambda x: unpack_planes(x).reshape(x.shape[0], 8*x.shape[1]))
print(f"unpack: {1e3*bench(up, [(X,) for X in Xs]):.3f}ms")
mm = jax.jit(lambda b, p: jax.lax.dot_general(b.astype(jnp.int8), p, dimension_numbers=(((1,),(0,)),((),())), preferred_element_type=jnp.int32))
P8s = [up(X) for X in Xs]
print(f"int8 matmul [256,256]x[256,{8*t}]: {1e3*bench(mm, [(bits, P) for P in P8s]):.3f}ms")
pk = jax.jit(lambda a: pack_planes((a & 1).astype(jnp.uint8).reshape(256, 8, t)))
As = [mm(bits, P) for P in P8s]
print(f"mask+pack: {1e3*bench(pk, [(A,) for A in As]):.3f}ms")

idx = jnp.asarray(rng.integers(0, 256, (256, 16), dtype=np.int32))
xr = jax.jit(xor_reduce_gather)
print(f"xor_gather [256x16] from [256,{t}]: {1e3*bench(xr, [(X, idx) for X in Xs]):.3f}ms")
slots = jnp.asarray(np.arange(256, dtype=np.int32))
sc = jax.jit(lambda out, s, v: out.at[s].set(jnp.take(out, s, axis=0) ^ v))
print(f"scatter-xor 256 rows: {1e3*bench(sc, [(Xs[i], slots, Xs[(i+1)%4]) for i in range(4)]):.3f}ms")

Xf = [jnp.asarray(rng.standard_normal((256, 8*t)).astype(np.float32)) for _ in range(4)]
Bf = jnp.asarray(rng.standard_normal((256,256)).astype(np.float32))
mf = jax.jit(lambda b, p: jnp.dot(b, p, preferred_element_type=jnp.float32))
print(f"f32 matmul: {1e3*bench(mf, [(Bf, X) for X in Xf]):.3f}ms")

# dispatch overhead: trivial op varied input
tr = jax.jit(lambda x: x + 1)
print(f"trivial x+1 on [256,{t}] u8: {1e3*bench(tr, [(X,) for X in Xs]):.3f}ms")
