"""Schedule solver correctness: dense oracle, systematic property, decode."""

import numpy as np
import pytest

from nanorq_tpu.gf256.numpy_ops import gf_solve_dense
from nanorq_tpu.precode.matrix import binary_rows, hdpc_full_rows
from nanorq_tpu.precode.schedule import Schedule, replay_numpy
from nanorq_tpu.precode.solver import solve, solve_encoder
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.rfc.tuples import lt_indices


def solver_order_A(P, isis=None, overhead=0):
    """A materialized in the solver's row order (LT | LDPC | HDPC)."""
    A = np.zeros((P.L + overhead, P.L), np.uint8)
    br = binary_rows(P, isis, overhead)
    for r, cols in enumerate(br):
        A[r, cols] = 1
    A[P.Kp + overhead + P.S :] = 0
    A[P.Kp + overhead + P.S :] = hdpc_full_rows(P)
    return A


def encode_block(P, src, T):
    """Solve + replay for the encoder system; returns C [L, T]."""
    S = solve_encoder(P)
    assert S is not None
    D = np.zeros((S.n_rows, T), np.uint8)
    D[: src.shape[0]] = src
    return replay_numpy(D, S), S


def lt_combine(C, isi, P, idx=None, valid=None):
    if idx is None:
        idx, valid = lt_indices(np.array([isi], np.uint32), P)
        idx, valid = idx[0], valid[0]
    out = np.zeros(C.shape[1], np.uint8)
    for c in idx[valid]:
        out ^= C[c]
    return out


@pytest.mark.parametrize("K", [1, 10, 27, 100, 250, 500])
def test_encoder_matches_dense_oracle(K):
    P = params_init(K)
    rng = np.random.default_rng(K)
    src = rng.integers(0, 256, (K, 8), dtype=np.uint8)
    C, S = encode_block(P, src, 8)
    A = solver_order_A(P)
    D = np.zeros((P.L, 8), np.uint8)
    D[:K] = src
    Cexp = gf_solve_dense(A, D)
    assert Cexp is not None
    assert np.array_equal(C, Cexp)


@pytest.mark.parametrize("K", [1, 10, 100, 500, 1000])
def test_systematic_property(K):
    """LT(C, isi) must reproduce source symbols (and zeros for padding).

    This is the end-to-end bit-exactness anchor: any error in the PRNG,
    tuples, matrix assembly, solver or replayer breaks it.
    """
    P = params_init(K)
    rng = np.random.default_rng(K + 7)
    src = rng.integers(0, 256, (K, 12), dtype=np.uint8)
    C, S = encode_block(P, src, 12)
    idx, valid = lt_indices(np.arange(P.Kp, dtype=np.uint32), P)
    for x in range(P.Kp):
        got = lt_combine(C, x, P, idx[x], valid[x])
        want = src[x] if x < K else np.zeros(12, np.uint8)
        assert np.array_equal(got, want), f"isi {x}"


@pytest.mark.parametrize("K,loss,ov,seed", [
    (100, 0.06, 0, 1), (100, 0.06, 5, 2), (500, 0.10, 5, 3),
    (10, 0.40, 3, 4), (250, 0.5, 40, 5),
])
def test_decode_recovers(K, loss, ov, seed):
    P = params_init(K)
    T = 8
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 256, (K, T), dtype=np.uint8)
    C, _ = encode_block(P, src, T)

    recv = rng.random(K) >= loss
    gaps = np.nonzero(~recv)[0]
    nrep = len(gaps) + ov
    rep_isis = np.arange(K, K + nrep) + (P.Kp - K)

    isis = np.arange(P.Kp + ov, dtype=np.uint32)
    isis[gaps] = rep_isis[: len(gaps)]
    isis[P.Kp :] = rep_isis[len(gaps) :]
    S = solve(P, binary_rows(P, isis, overhead=ov), overhead=ov)
    assert S is not None
    D = np.zeros((S.n_rows, T), np.uint8)
    for e in np.nonzero(recv)[0]:
        D[e] = src[e]
    for slot, isi in zip(gaps, rep_isis[: len(gaps)]):
        D[slot] = lt_combine(C, isi, P)
    for slot, isi in zip(range(P.Kp, P.Kp + ov), rep_isis[len(gaps) :]):
        D[slot] = lt_combine(C, isi, P)
    C2 = replay_numpy(D, S)
    assert np.array_equal(C2, C)
    for g in gaps:
        assert np.array_equal(lt_combine(C, int(g), P), src[g])


def test_singular_system_returns_none():
    """Two identical LT rows (duplicate ISI) make the system rank deficient."""
    P = params_init(10)
    isis = np.arange(P.Kp, dtype=np.uint32)
    isis[0] = 5
    isis[5] = 5  # duplicate row
    S = solve(P, binary_rows(P, isis))
    assert S is None


def test_schedule_roundtrip_serialization(tmp_path):
    P = params_init(50)
    S = solve_encoder(P)
    path = str(tmp_path / "sched.npz")
    S.save(path)
    S2 = Schedule.load(path)
    assert S2.L == S.L and S2.n_ops == S.n_ops
    assert np.array_equal(S2.op_i, S.op_i)
    assert np.array_equal(S2.gather, S.gather)
    rng = np.random.default_rng(0)
    D = np.zeros((S.n_rows, 4), np.uint8)
    D[:50] = rng.integers(0, 256, (50, 4), dtype=np.uint8)
    assert np.array_equal(replay_numpy(D, S), replay_numpy(D, S2))
