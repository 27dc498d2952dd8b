"""Batched LT symbol combine (the reference's decode_row, nanorq.c:184-204).

Encoding symbol ISI x is the XOR of its tuple-expanded neighbor rows of the
intermediate matrix C.  The host expands neighbors for a whole batch of ISIs
(rfc.tuples.lt_indices), buckets them by degree, and the device runs one
gather + XOR-reduce per bucket — wide VPU work with no sequential chain.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nanorq_tpu.ops.gfmat import xor_reduce_gather
from nanorq_tpu.rfc.params import Params
from nanorq_tpu.rfc.tuples import lt_indices

_DEG_BUCKETS = (4, 8, 12, 16, 24, 33)


@dataclass
class LTPlan:
    """Bucketed neighbor-gather plan for a fixed batch of ISIs."""

    n: int  # number of symbols
    n_pad: int
    buckets: tuple  # ((out_slots [r], idx [r, w]), ...); idx sentinel = L


def lt_plan(isis: np.ndarray, P: Params, n_pad: int | None = None) -> LTPlan:
    isis = np.asarray(isis, dtype=np.uint32)
    n = isis.shape[0]
    n_pad = n_pad or n
    idx, valid = lt_indices(isis, P)
    deg = valid.sum(1)
    buckets = []
    lo = 0
    for w in _DEG_BUCKETS:
        pick = np.nonzero((deg > lo) & (deg <= w))[0]
        lo = w
        if pick.size == 0:
            continue
        r = pick.size
        slots = pick.astype(np.int32)
        bidx = np.full((r, w), P.L, np.int32)
        for rr, p in enumerate(pick):
            v = idx[p][valid[p]]
            bidx[rr, : len(v)] = v
        buckets.append((jnp.asarray(slots), jnp.asarray(bidx)))
    return LTPlan(n=n, n_pad=n_pad, buckets=tuple(buckets))


@partial(jax.jit, static_argnames=("n_pad",))
def _lt_apply(buckets, C_ext: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    t = C_ext.shape[1]
    out = jnp.zeros((n_pad, t), jnp.uint8)
    for slots, idx in buckets:
        out = out.at[slots].set(xor_reduce_gather(C_ext, idx), mode="drop", unique_indices=True)
    return out


def lt_combine(C: jnp.ndarray, plan: LTPlan) -> jnp.ndarray:
    """C [L, t] -> symbols [n_pad, t] for the plan's ISIs (row order = isis)."""
    C_ext = jnp.concatenate([C, jnp.zeros((1, C.shape[1]), jnp.uint8)], axis=0)
    return _lt_apply(plan.buckets, C_ext, plan.n_pad)
