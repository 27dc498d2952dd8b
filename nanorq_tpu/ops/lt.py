"""Batched LT symbol combine (the reference's decode_row, nanorq.c:184-204).

Encoding symbol ISI x is the XOR of its tuple-expanded neighbor rows of the
intermediate matrix C.  The host expands neighbors for a whole batch of ISIs
(rfc.tuples.lt_indices) into the same scatter-free GatherPlan shape the
replayer uses: a row-aligned full-coverage pass for the common low degrees
plus one-hot-placed overflow gathers for the heavy tail — all wide VPU/DMA
work with no sequential chain.
"""

from collections import OrderedDict
from dataclasses import dataclass
from functools import partial
from threading import Lock

import jax
import jax.numpy as jnp
import numpy as np


from nanorq_tpu.rfc.params import Params
from nanorq_tpu.rfc.tuples import lt_indices


def _pad_rows(n: int) -> int:
    p = 8
    while p < n:
        p *= 2
    return p


@dataclass
class LTPlan:
    """Neighbor-gather plan for a fixed batch of ISIs."""

    n: int  # number of symbols
    n_pad: int  # padded output rows
    L: int  # C rows; index L = zero sentinel
    plan: tuple  # jnp (passes, overflow) as in ops.replay._apply_plan


_plan_lock = Lock()
_plan_cache: OrderedDict[bytes, LTPlan] = OrderedDict()
_PLAN_CAPACITY = 128


def lt_plan(isis: np.ndarray, P: Params, w_small: int = 8) -> LTPlan:
    """Build (or fetch) the neighbor-gather plan for a batch of ISIs.

    Cached keyed on (K', w_small, isis): steady-state encoders emit the same
    ESI window every call (reference decode_row has no per-call setup to
    amortize, nanorq.c:184-204; our batched plan does, so it must be cached —
    the plan also holds device-resident index tensors, so a hit skips both
    host planning and re-upload).
    """
    from nanorq_tpu.precode.device_schedule import _gather_plan_flat
    from nanorq_tpu.ops.replay import _plan_arrays

    isis = np.asarray(isis, dtype=np.uint32)
    key = b"%d|%d|" % (P.Kp, w_small) + isis.tobytes()
    with _plan_lock:
        hit = _plan_cache.get(key)
        if hit is not None:
            _plan_cache.move_to_end(key)
    if hit is not None:
        from nanorq_tpu.utils import stats

        stats.count("lt_plan_cache_hit")
        return hit
    n = isis.shape[0]
    n_pad = _pad_rows(n)
    idx, valid = lt_indices(isis, P)
    erows, ecols = np.nonzero(valid)
    gp = _gather_plan_flat(
        n_pad, erows.astype(np.int64), idx[erows, ecols].astype(np.int64),
        sentinel=P.L, w_small=w_small,
    )
    plan = LTPlan(n=n, n_pad=n_pad, L=P.L, plan=_plan_arrays(gp))
    with _plan_lock:
        _plan_cache[key] = plan
        while len(_plan_cache) > _PLAN_CAPACITY:
            _plan_cache.popitem(last=False)
    return plan


@partial(jax.jit, static_argnames=("n_pad", "pallas"))
def _lt_apply(plan, C_ext: jnp.ndarray, n_pad: int, pallas: bool) -> jnp.ndarray:
    from nanorq_tpu.ops.replay import _LT_GP, _apply_plan

    t = C_ext.shape[1]
    return _apply_plan(pallas, C_ext, plan, jnp.zeros((n_pad, t), jnp.uint8), gp=_LT_GP)


def lt_combine(C: jnp.ndarray, plan: LTPlan, backend: str | None = None) -> jnp.ndarray:
    """C [L, t] -> symbols [n_pad, t] for the plan's ISIs (row order = isis)."""
    from nanorq_tpu.ops.replay import default_backend

    pallas = (backend or default_backend()) == "pallas"
    C_ext = jnp.concatenate([C, jnp.zeros((1, C.shape[1]), jnp.uint8)], axis=0)
    return _lt_apply(plan.plan, C_ext, plan.n_pad, pallas)
