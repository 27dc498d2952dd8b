import time, numpy as np, jax, jax.numpy as jnp
N = 30
rng = np.random.default_rng(0)
M = K = 1024; T = 8192
A = jnp.asarray(rng.standard_normal((M,K)).astype(np.float32)).astype(jnp.bfloat16)
X0 = jnp.asarray(rng.standard_normal((K,T)).astype(np.float32)).astype(jnp.bfloat16)
@jax.jit
def run(x):
    def body(i, a):
        return jnp.dot(A, a, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jax.lax.fori_loop(0, N, body, x)
o = run(X0); _=np.asarray(o[0,:2])
t0=time.time(); o = run(X0); _=np.asarray(o[0,:2]); per=(time.time()-t0)/N
print(f"XLA bf16 matmul [1024,1024]x[1024,8192]: {1e3*per:.3f}ms -> {M*K*T/per/1e12:.1f} T MAC/s")
# bigger
T2 = 32768
X1 = jnp.asarray(rng.standard_normal((K,T2)).astype(np.float32)).astype(jnp.bfloat16)
@jax.jit
def run2(x):
    return jax.lax.fori_loop(0, N, lambda i, a: jnp.dot(A, a, preferred_element_type=jnp.float32).astype(jnp.bfloat16), x)
o = run2(X1); _=np.asarray(o[0,:2])
t0=time.time(); o=run2(X1); _=np.asarray(o[0,:2]); per=(time.time()-t0)/N
print(f"XLA bf16 [1024,1024]x[1024,{T2}]: {1e3*per:.3f}ms -> {M*K*T2/per/1e12:.1f} T MAC/s")
# square big matmul, no loop chain: 8 independent matmuls
Ab = jnp.asarray(rng.standard_normal((4096,4096)).astype(np.float32)).astype(jnp.bfloat16)
Xb = jnp.asarray(rng.standard_normal((4096,4096)).astype(np.float32)).astype(jnp.bfloat16)
@jax.jit
def run3(x):
    return jax.lax.fori_loop(0, N, lambda i, a: jnp.dot(Ab, a, preferred_element_type=jnp.float32).astype(jnp.bfloat16), x)
o = run3(Xb); _=np.asarray(o[0,:2])
t0=time.time(); o=run3(Xb); _=np.asarray(o[0,:2]); per=(time.time()-t0)/N
print(f"XLA bf16 [4096x4096]^2: {1e3*per:.3f}ms -> {4096**3/per/1e12:.1f} T MAC/s")
