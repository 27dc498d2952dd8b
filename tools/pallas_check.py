import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] ^ jnp.uint8(0xFF)

@jax.jit
def f(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.asarray(np.arange(256*128, dtype=np.uint8).reshape(256,128))
y = np.asarray(f(x))
print("pallas xor ok:", np.array_equal(y, np.asarray(x) ^ 0xFF))

# int8 dot in pallas
def mk(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(a_ref[:], b_ref[:], dimension_numbers=(((1,),(0,)),((),())), preferred_element_type=jnp.int32)

@jax.jit
def g(a, b):
    return pl.pallas_call(
        mk,
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
rng = np.random.default_rng(0)
A = rng.integers(0, 2, (128, 256), dtype=np.int8); B = rng.integers(0, 2, (256, 512), dtype=np.int8)
out = np.asarray(g(jnp.asarray(A), jnp.asarray(B)))
print("pallas int8 dot ok:", np.array_equal(out, A.astype(np.int32) @ B.astype(np.int32)))
