import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.ops.pallas_kernels import gather_xor_pallas
rng = np.random.default_rng(0)
t = 40960
N = 60
S = jnp.asarray(rng.integers(0,256,(1073, t),dtype=np.uint8))
for (n, w) in [(1024, 12), (512, 4), (512, 8)]:
    idx = jnp.asarray(rng.integers(0, 1072, (n, w)).astype(np.int32))
    for R in (8, 16, 32):
        for tw in (4096, 8192):
            if R * w * tw > (8<<20): continue
            @jax.jit
            def loop(x, R=R, tw=tw, idx=idx, n=n):
                def body(i, a):
                    r = gather_xor_pallas(a, idx, R=R, tw=tw)
                    return a.at[:n].set(r)
                return jax.lax.fori_loop(0, N, body, x)
            t0=time.time(); o=loop(S); _=np.asarray(o[0,:4])
            t0=time.time(); o=loop(S); _=np.asarray(o[0,:4]); per=(time.time()-t0-0.035)/N
            print(f"n={n} w={w} R={R} tw={tw}: {1e3*per:.3f}ms ({n*w*t/per/1e9:.0f} GB/s gathered)")
