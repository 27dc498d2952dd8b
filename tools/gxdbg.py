import numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.ops.pallas_kernels import gather_xor_pallas
rng = np.random.default_rng(0)
S = jnp.asarray(rng.integers(0,256,(1281, 10240),dtype=np.uint8))
idx = jnp.asarray(rng.integers(0,1281,(64, 64)).astype(np.int32))
o = gather_xor_pallas(S, idx)
print("ok", np.array_equal(np.asarray(o), np.bitwise_xor.reduce(np.asarray(S)[np.asarray(idx)], axis=1)))
