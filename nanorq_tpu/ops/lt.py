"""Batched LT symbol combine (the reference's decode_row, nanorq.c:184-204).

Encoding symbol ISI x is the XOR of its tuple-expanded neighbor rows of the
intermediate matrix C.  The host expands neighbors for a whole batch of ISIs
(rfc.tuples.lt_indices), buckets them by degree, and the device runs one
gather + XOR-reduce per bucket — wide VPU work with no sequential chain.
Bucket row counts and widths are quantized so differently-sized batches for
one K' share compiled programs.
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


def _pad_rows(n: int) -> int:
    p = 8
    while p < n:
        p *= 2
    return p


@dataclass
class LTPlan:
    """Bucketed neighbor-gather plan for a fixed batch of ISIs."""

    n: int  # number of symbols
    n_pad: int  # padded output rows (trash row at index n_pad)
    L: int  # C rows; index L = zero sentinel
    buckets: tuple  # ((out_slots [r_pad], idx [r_pad, w]), ...)


def lt_plan(isis: np.ndarray, P: Params) -> LTPlan:
    isis = np.asarray(isis, dtype=np.uint32)
    n = isis.shape[0]
    n_pad = _pad_rows(n)
    idx, valid = lt_indices(isis, P)
    deg = valid.sum(1)
    buckets = []
    lo = 0
    for w in _DEG_BUCKETS:
        pick = np.nonzero((deg > lo) & (deg <= w))[0]
        lo = w
        if pick.size == 0:
            continue
        r_pad = _pad_rows(pick.size)
        slots = np.full(r_pad, n_pad, np.int32)  # padding -> trash row
        bidx = np.full((r_pad, w), P.L, np.int32)  # padding -> zero sentinel
        slots[: pick.size] = pick
        for rr, p in enumerate(pick):
            v = idx[p][valid[p]]
            bidx[rr, : len(v)] = v
        buckets.append((jnp.asarray(slots), jnp.asarray(bidx)))
    return LTPlan(n=n, n_pad=n_pad, L=P.L, buckets=tuple(buckets))


@partial(jax.jit, static_argnames=("n_pad",))
def _lt_apply(buckets, C_ext: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    t = C_ext.shape[1]
    out = jnp.zeros((n_pad + 1, t), jnp.uint8)
    for slots, idx in buckets:
        out = out.at[slots].set(xor_reduce_gather(C_ext, idx), mode="drop")
    return out[:n_pad]


def lt_combine(C: jnp.ndarray, plan: LTPlan) -> jnp.ndarray:
    """C [L, t] -> symbols [n_pad, t] for the plan's ISIs (row order = isis)."""
    C_ext = jnp.concatenate([C, jnp.zeros((1, C.shape[1]), jnp.uint8)], axis=0)
    return _lt_apply(plan.buckets, C_ext, plan.n_pad)
