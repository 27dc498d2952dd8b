import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
for N in (10, 100, 1000):
    x0 = jnp.asarray(rng.integers(0,256,(8,128),dtype=np.uint8))
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, N, lambda i, a: a ^ jnp.uint8(i & 3), x)
    o = run(x0); _=np.asarray(o[0,:2])
    t0=time.time(); o=run(x0); _=np.asarray(o[0,:2]); per=(time.time()-t0)/N
    print(f"N={N}: trivial xor per-iter {1e6*per:.1f}us")
# and one medium matmul at N=300
A = jnp.asarray(rng.standard_normal((1024,1024)).astype(np.float32)).astype(jnp.bfloat16)
X = jnp.asarray(rng.standard_normal((1024,8192)).astype(np.float32)).astype(jnp.bfloat16)
for N in (30, 300):
    @jax.jit
    def run2(x):
        return jax.lax.fori_loop(0, N, lambda i, a: jnp.dot(A, a, preferred_element_type=jnp.float32).astype(jnp.bfloat16), x)
    o = run2(X); _=np.asarray(o[0,:2])
    t0=time.time(); o=run2(X); _=np.asarray(o[0,:2]); per=(time.time()-t0)/N
    print(f"N={N}: matmul per-iter {1e3*per:.3f}ms")
