import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
N = 30

def devloop(run, x0, n=N):
    o = run(x0); _ = np.asarray(o).ravel()[:2]
    t0 = time.time(); o = run(x0); _ = np.asarray(o).ravel()[:2]
    return (time.time() - t0) / n

rng = np.random.default_rng(0)
M, K, T, TW = 1024, 1024, 8192, 512
mac = M*K*T
for name, dt, acc in [("int8->int32", jnp.int8, jnp.int32), ("bf16->f32", jnp.bfloat16, jnp.float32), ("f32->f32", jnp.float32, jnp.float32)]:
    A = jnp.asarray(rng.integers(0,2,(M,K)).astype(np.float32)).astype(dt)
    def kern(a_ref, x_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(a_ref[:], x_ref[:], dimension_numbers=(((1,),(0,)),((),())), preferred_element_type=acc).astype(o_ref.dtype)
    call = lambda x: pl.pallas_call(kern, grid=(T//TW,),
        in_specs=[pl.BlockSpec((M,K), lambda j: (0,0)), pl.BlockSpec((K,TW), lambda j: (0,j))],
        out_specs=pl.BlockSpec((M,TW), lambda j: (0,j)),
        out_shape=jax.ShapeDtypeStruct((M, T), dt))(A, x)
    X0 = jnp.asarray(rng.integers(0,2,(K,T)).astype(np.float32)).astype(dt)
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, N, lambda i, a: call(a), x)
    per = devloop(run, X0)
    print(f"{name}: {1e3*per:.3f}ms -> {mac/per/1e12:.1f} T MAC/s")
