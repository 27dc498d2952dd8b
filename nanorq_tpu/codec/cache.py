"""Schedule and plan caches.

The encoder precode system depends only on K', so its solved DeviceSchedule
is cached globally and shared by every block and every Encoder instance —
this is the always-on generalization of the reference's nanorq_precalculate
(lib/nanorq.c:393-401).  Decoder schedules depend on the received-ISI
pattern; they are LRU-cached so steady loss patterns (and benchmark loops)
re-solve nothing.  Serialization helpers let long-lived services persist
solved schedules across restarts (SURVEY.md s5 checkpoint/resume).
"""

import os
import pickle
from collections import OrderedDict
from threading import Lock

import numpy as np

from nanorq_tpu.precode.device_schedule import DeviceSchedule, compile_device
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.solver import solve_state
from nanorq_tpu.rfc.params import Params, params_init

_enc_lock = Lock()
_enc_cache: dict[tuple[int, int], DeviceSchedule] = {}

_dec_lock = Lock()
_dec_cache: OrderedDict[bytes, DeviceSchedule | None] = OrderedDict()
_DEC_CAPACITY = 128


def encoder_schedule(Kp: int, CB: int | None = None) -> DeviceSchedule:
    """Solved encoder-side schedule for K' (loss independent, cached)."""
    from nanorq_tpu.utils import stats

    key = (Kp, CB)
    with _enc_lock:
        ds = _enc_cache.get(key)
    if ds is not None:
        stats.count("enc_schedule_cache_hit")
        return ds
    P = params_init(Kp)
    assert P.Kp == Kp
    with stats.timer("enc_solve"):
        st = solve_state(P, binary_rows(P))
    if st is None:  # cannot happen for Table 2 K' values
        raise RuntimeError(f"encoder precode solve failed for K'={Kp}")
    ds = compile_device(st, CB=CB)
    with _enc_lock:
        _enc_cache[key] = ds
    return ds


def clear_decoder_cache() -> None:
    """Drop all cached per-pattern decoder schedules (benchmarks use this to
    force fresh solves; production code never needs it)."""
    with _dec_lock:
        _dec_cache.clear()


def clear_encoder_cache() -> None:
    with _enc_lock:
        _enc_cache.clear()


_rows_lock = Lock()
_rows_cache: dict[int, list] = {}


def _patched_rows(P: Params, isis: np.ndarray, overhead: int):
    """Binary rows (CSR) for a decode pattern, reusing cached encoder rows.

    Only the slots whose ISI differs from the systematic 0..K'-1 sequence
    (the patched gaps + overhead rows) need fresh LT expansion — typically a
    few percent of K'.  The splice is fully vectorized (one flat-buffer
    scatter), never materializing per-row Python lists.
    """
    from nanorq_tpu.precode.matrix import CSRRows, lt_rows_csr

    with _rows_lock:
        base = _rows_cache.get(P.Kp)
    if base is None:
        base = binary_rows(P)
        with _rows_lock:
            _rows_cache[P.Kp] = base
    Kp, S = P.Kp, P.S
    isis = np.asarray(isis, np.uint32)
    changed = np.nonzero(isis != np.arange(Kp + overhead, dtype=np.uint32))[0]
    changed = np.union1d(changed, np.arange(Kp, Kp + overhead)).astype(np.int64)
    if not changed.size:
        return base
    fresh = lt_rows_csr(isis[changed], P)

    n = Kp + overhead + S
    src = np.empty(n, np.int64)  # base row per output row; -1 marks changed
    src[:Kp] = np.arange(Kp)
    src[Kp + overhead :] = Kp + np.arange(S)
    src[changed] = -1

    lens = np.empty(n, np.int64)
    keep = src >= 0
    lens[keep] = base.ptr[src[keep] + 1] - base.ptr[src[keep]]
    lens[changed] = fresh.lens()
    ptr = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=ptr[1:])
    cols = np.empty(int(ptr[-1]), np.int32)

    from nanorq_tpu.native import splice_rows_native

    if not splice_rows_native(n, base.ptr, base.cols, src, fresh.ptr, fresh.cols, ptr, cols):
        # NumPy fallback: repeat/scatter formulation of the same splice
        def within(ls):
            csum = np.zeros(ls.size + 1, np.int64)
            np.cumsum(ls, out=csum[1:])
            return np.arange(int(ls.sum()), dtype=np.int64) - np.repeat(csum[:-1], ls)

        kidx = np.nonzero(keep)[0]
        _, vals = base.select_flat(src[kidx])
        cols[np.repeat(ptr[kidx], lens[kidx]) + within(lens[kidx])] = vals
        cols[np.repeat(ptr[changed], lens[changed]) + within(lens[changed])] = fresh.cols
    return CSRRows(cols, ptr)


class WSchedule:
    """Per-pattern dense combination matrix (ops/wpath.py): the decode
    device work is one GF(2) matmul over gathered payload rows.  Output
    row r is the r-th requested gap symbol."""

    __slots__ = ("Wbits", "rows", "M_pad", "n_out", "_staged")

    def __init__(self, Wbits: np.ndarray, rows: np.ndarray, M_pad: int, n_out: int):
        from nanorq_tpu.precode.device_schedule import _pad_rows

        m_pad = _pad_rows(max(n_out, 1))
        if Wbits.shape[0] != m_pad:  # quantize m so patterns share programs
            Wp = np.zeros((m_pad, Wbits.shape[1]), np.uint8)
            Wp[: Wbits.shape[0]] = Wbits
            Wbits = Wp
        self.Wbits, self.rows, self.M_pad, self.n_out = Wbits, rows, M_pad, n_out
        self._staged = None

    def staged(self):
        if self._staged is None:
            from nanorq_tpu.ops.wpath import stage_w_gf2

            self._staged = stage_w_gf2(self.Wbits, self.rows)
        return self._staged


# Decode W-path cutover: above this K' the dense matmul's O(K'^2 t) loses
# to the structured replay's O(nnz t) (measured: 5.4x faster at K=10000,
# roughly break-even ~ K'=50000 where host W prep also hits ~140 ms).
WPATH_MAX_KP = int(os.environ.get("NANORQ_WPATH_MAX_KP", 16384))


def decoder_plan(P: Params, isis: np.ndarray, overhead: int):
    """Best decode plan for a pattern: a WSchedule (dense combination
    matmul) when the factorization is binary and K' is in the dense-win
    regime, else the structured DeviceSchedule.  Cached; None on rank
    deficiency."""
    from nanorq_tpu.utils import stats

    key = b"P|%d|%d|" % (P.Kp, overhead) + np.ascontiguousarray(isis, np.uint32).tobytes()
    with _dec_lock:
        if key in _dec_cache:
            _dec_cache.move_to_end(key)
            stats.count("dec_schedule_cache_hit")
            return _dec_cache[key]
    with stats.timer("dec_solve"):
        st = solve_state(P, _patched_rows(P, isis, overhead), overhead)
    plan = None
    if st is not None:
        use_w = (
            P.Kp <= WPATH_MAX_KP
            and not st.hdpc_used
            and getattr(st, "tri_edges", None) is not None
        )
        if use_w:
            from nanorq_tpu.ops.wpath import w_rows_gf2
            from nanorq_tpu.precode.device_schedule import _pad_rows
            from nanorq_tpu.precode.matrix import lt_rows_csr

            gaps = np.nonzero(isis[: P.Kp] != np.arange(P.Kp, dtype=np.uint32))[0]
            M_pad = _pad_rows(st.M + 1)
            with stats.timer("dec_wrows"):
                Wbits, rows = w_rows_gf2(st, lt_rows_csr(gaps.astype(np.uint32), P), zero_row=M_pad - 1)
            plan = WSchedule(Wbits, rows, M_pad, gaps.size)
        else:
            plan = compile_device(st)
    if plan is None:
        stats.count("decode_rank_deficient")
    with _dec_lock:
        _dec_cache[key] = plan
        while len(_dec_cache) > _DEC_CAPACITY:
            _dec_cache.popitem(last=False)
    return plan


def decoder_schedule(P: Params, isis: np.ndarray, overhead: int, CB: int | None = None) -> DeviceSchedule | None:
    """Solve (or fetch) the schedule for a decode-side patched system.

    Returns None on rank deficiency (decode failure — feed more symbols).
    Failures are cached too: retrying the same pattern cannot succeed.
    """
    from nanorq_tpu.utils import stats

    key = b"%d|%d|%d|" % (P.Kp, overhead, CB or 0) + np.ascontiguousarray(isis, np.uint32).tobytes()
    with _dec_lock:
        if key in _dec_cache:
            _dec_cache.move_to_end(key)
            stats.count("dec_schedule_cache_hit")
            return _dec_cache[key]
    with stats.timer("dec_solve"):
        st = solve_state(P, _patched_rows(P, isis, overhead), overhead)
    ds = None if st is None else compile_device(st, CB=CB)
    if ds is None:
        stats.count("decode_rank_deficient")
    with _dec_lock:
        _dec_cache[key] = ds
        while len(_dec_cache) > _DEC_CAPACITY:
            _dec_cache.popitem(last=False)
    return ds


def save_schedule(ds: DeviceSchedule, path: str) -> None:
    """Persist a solved schedule (checkpoint/resume for long-lived encoders)."""
    with open(path, "wb") as f:
        pickle.dump(ds, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_schedule(path: str) -> DeviceSchedule:
    with open(path, "rb") as f:
        ds = pickle.load(f)
    assert isinstance(ds, DeviceSchedule)
    return ds


def warm_encoder_cache(Kp: int, cache_dir: str | None = None, CB: int | None = None) -> DeviceSchedule:
    """Disk-backed variant of encoder_schedule for cold-start latency.

    CB defaults to None (adaptive chunk size) so warm-started processes share
    cache entries — both in-memory key and compiled program — with the normal
    encoder_schedule path.
    """
    if cache_dir is None:
        return encoder_schedule(Kp, CB)
    path = os.path.join(cache_dir, f"enc_{Kp}_{'auto' if CB is None else CB}.sched")
    key = (Kp, CB)
    with _enc_lock:
        if key in _enc_cache:
            return _enc_cache[key]
    if os.path.exists(path):
        ds = load_schedule(path)
        with _enc_lock:
            _enc_cache[key] = ds
        return ds
    ds = encoder_schedule(Kp, CB)
    os.makedirs(cache_dir, exist_ok=True)
    save_schedule(ds, path)
    return ds
