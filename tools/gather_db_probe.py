# Double-buffered gather-XOR probe: can an HBM-resident source sustain
# issue-rate-bound gather throughput (no VMEM promotion), unlocking wide
# batches at large K?  Compares the production kernel vs a software-
# pipelined variant that issues step i's DMAs before waiting on step i-1.
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanorq_tpu.ops.pallas_kernels import gather_xor_pallas

rng = np.random.default_rng(0)
N = int(os.environ.get("N", "20"))


def timeit(fn, x0):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, N, fn, x)

    o = loop(x0)
    _ = np.asarray(o[0, :4])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        o = loop(x0)
        _ = np.asarray(o[0, :4])
        best = min(best, time.time() - t0 - 0.035)
    return best / N


def _db_factory(R, w, nsteps):
    def kernel(idx_ref, src_ref, o_ref, scratch, sems):
        # grid = (t_tiles, nsteps+1): i = program_id(1) sweeps the pipeline
        # for one payload tile j; issue step i, process step i-1.
        i = pl.program_id(1)
        j = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        pslot = jax.lax.rem(i + 1, 2)

        @pl.when(i < nsteps)
        def _():
            for r in range(R):
                for k in range(w):
                    pltpu.make_async_copy(
                        src_ref.at[idx_ref[r, k], j], scratch.at[slot, r, k], sems.at[slot]
                    ).start()

        @pl.when(i > 0)
        def _():
            waiter = pltpu.make_async_copy(src_ref.at[0, j], scratch.at[pslot, 0, 0], sems.at[pslot])
            for _ in range(R * w):
                waiter.wait()
            acc = scratch[pslot, :, 0]
            for k in range(1, w):
                acc = acc ^ scratch[pslot, :, k]
            o_ref[:, 0] = acc

    return kernel


@partial(jax.jit, static_argnames=("R", "tw"))
def gather_db(src, idx, R=16, tw=None):
    n, w = idx.shape
    S, t = src.shape
    if tw is None:
        tw = t
    assert t % tw == 0 and n % R == 0 and tw % 1024 == 0
    nsteps = n // R
    src4 = src.reshape(S, t // tw, tw // 128, 128)
    out4 = pl.pallas_call(
        _db_factory(R, w, nsteps),
        grid=(t // tw, nsteps + 1),
        in_specs=[
            pl.BlockSpec((R, w), lambda j, i: (jnp.minimum(i, nsteps - 1), 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (R, 1, tw // 128, 128), lambda j, i: (jnp.maximum(i - 1, 0), j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, t // tw, tw // 128, 128), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, R, w, tw // 128, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(idx, src4)
    return out4.reshape(n, t)


# shapes: (S, n, w, t, label) — replay chunk gathers with HBM-resident src
# (S*t >> 105MB) at wide batch, plus the current VMEM-resident working point
SHAPES = [
    (51201, 1024, 4, 20480, "K5e4-B16-w4"),  # 1.0 GB src: HBM resident
    (51201, 1024, 8, 20480, "K5e4-B16-w8"),
    (51201, 1024, 4, 10240, "K5e4-B8-w4"),  # 524 MB src
    (51201, 1024, 4, 5120, "K5e4-B4-w4"),  # 262 MB src
    (10241, 512, 8, 20480, "K1e4-B16-w8"),  # 210 MB src
    (10241, 512, 8, 5120, "K1e4-B4-w8"),  # 52 MB src: VMEM promoted
]
pick = os.environ.get("SHAPES")
if pick:
    want = set(pick.split(","))
    SHAPES = [sh for sh in SHAPES if sh[4] in want]

for S, n, w, t, name in SHAPES:
    src_np = rng.integers(0, 256, (S, t), dtype=np.uint8)
    src_np[S - 1] = 0
    src = jnp.asarray(src_np)
    idx_np = rng.integers(0, S - 1, (n, w)).astype(np.int32)
    idx_np[rng.random((n, w)) < 0.35] = S - 1
    idx = jnp.asarray(idx_np)
    ref = np.bitwise_xor.reduce(src_np[idx_np], axis=1)
    gb = n * w * t / 1e9
    print(f"{name}: src {S*t/1e6:.0f} MB, gathered {gb*1e3:.0f} MB")
    for R in (8, 16, 32):
        for tw in (5120, 10240, 20480):
            if t % tw or n % R or 2 * R * w * tw > (10 << 20):
                continue
            got = np.asarray(gather_db(src, idx, R=R, tw=tw))
            ok = np.array_equal(got, ref)
            per = timeit(lambda i, a, R=R, tw=tw: a.at[:n].set(gather_db(a, idx, R=R, tw=tw)), src)
            print(f"  db   R={R} tw={tw}: {1e3*per:.3f}ms ({gb/per:.0f} GB/s, ok={ok})")
    for R, tw in ((32, 20480), (8, None)):
        tw_eff = t if tw is None else min(tw, t)
        if t % tw_eff or R * w * tw_eff > (6 << 20):
            continue
        got = np.asarray(gather_xor_pallas(src, idx, R=R, tw=tw_eff))
        ok = np.array_equal(got, ref)
        per = timeit(
            lambda i, a, R=R, tw=tw_eff: a.at[:n].set(gather_xor_pallas(a, idx, R=R, tw=tw)), src
        )
        print(f"  prod R={R} tw={tw_eff}: {1e3*per:.3f}ms ({gb/per:.0f} GB/s, ok={ok})")
