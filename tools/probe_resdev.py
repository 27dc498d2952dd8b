import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.ops.wpath import _res_batch_jit

nb, nr, g, kc, T = 32, 128, 128, 1024, 1280
rng = np.random.default_rng(0)
W = jnp.asarray(rng.integers(0, 256, (nb, nr, kc), dtype=np.uint8))
D0 = jnp.asarray(rng.integers(0, 256, (nb, kc, T), dtype=np.uint8))
R = jnp.asarray(rng.integers(0, 256, (nb, g, nr), dtype=np.uint8))
y = jnp.asarray(rng.integers(0, 256, (nb, nr, T), dtype=np.uint8))
for it in range(4):
    t0 = time.time()
    X = _res_batch_jit(W, D0, R, y)
    X.block_until_ready()
    t1 = time.time()
    print(f"iter {it}: dispatch+compute {1e3*(t1-t0):.1f} ms")
# now time upload separately
Wh, Dh, Rh, yh = map(np.asarray, (W, D0, R, y))
for it in range(3):
    t0 = time.time()
    a = jnp.asarray(Dh); b = jnp.asarray(Wh); c = jnp.asarray(Rh); d = jnp.asarray(yh)
    jax.block_until_ready((a, b, c, d))
    t1 = time.time()
    X = _res_batch_jit(b, a, c, d); X.block_until_ready()
    t2 = time.time()
    Xh = np.asarray(X)
    t3 = time.time()
    print(f"iter {it}: upload {1e3*(t1-t0):.1f} ms, compute {1e3*(t2-t1):.1f} ms, download {1e3*(t3-t2):.1f} ms")
