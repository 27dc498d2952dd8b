"""Precode matrix assembly tests: HDPC closed form, LDPC structure."""

import numpy as np
import pytest

from nanorq_tpu.gf256.tables import GF_MUL, OCT_EXP
from nanorq_tpu.precode.matrix import binary_rows, dense_A, hdpc_full_rows, make_hdpc
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.rfc.rand import rnd_get


def hdpc_direct(P):
    """Independent per-column transcription of the reference recurrence
    (lib/precode.c:60-83) used to validate the vectorized closed form."""
    H, n = P.H, P.Kp + P.S
    M = np.zeros((H, n), np.uint8)
    for row in range(H):
        M[row, n - 1] = OCT_EXP[row]
    for col in range(n - 2, -1, -1):
        for row in range(H):
            M[row, col] = GF_MUL[2, M[row, col + 1]]
        b1 = rnd_get(np.uint32(col + 1), 6, H)
        b2 = (b1 + rnd_get(np.uint32(col + 1), 7, H - 1) + 1) % H
        M[b1, col] ^= 1
        M[b2, col] ^= 1
    return M


@pytest.mark.parametrize("K", [1, 27, 100, 500])
def test_hdpc_matches_direct_recurrence(K):
    P = params_init(K)
    assert np.array_equal(make_hdpc(P), hdpc_direct(P))


def test_hdpc_identity_part():
    P = params_init(100)
    A = hdpc_full_rows(P)
    assert A.shape == (P.H, P.L)
    ident = A[:, P.Kp + P.S :]
    assert np.array_equal(ident, np.eye(P.H, dtype=np.uint8))


@pytest.mark.parametrize("K", [1, 100, 1000])
def test_ldpc_structure(K):
    P = params_init(K)
    A = dense_A(P)
    ldpc = A[: P.S]
    # identity band at cols [B, W)
    assert np.array_equal(ldpc[:, P.B : P.W], np.eye(P.S, dtype=np.uint8))
    # each LDPC1 column has exactly 3 ones (circulant bands)
    assert np.all(ldpc[:, : P.B].sum(0) == 3)
    # LDPC2: each row has exactly 2 ones in PI cols (P > 1 in Table 2)
    assert np.all(ldpc[:, P.W :].sum(1) == 2)


@pytest.mark.parametrize("K", [10, 100, 1000])
def test_lt_rows_within_bounds(K):
    P = params_init(K)
    rows = binary_rows(P)
    for cols in rows[: P.Kp]:
        assert cols.size >= 2
        assert np.all((cols >= 0) & (cols < P.L))
        assert np.unique(cols).size == cols.size  # no duplicate neighbors
        assert np.any(cols >= P.W)  # at least the PI neighbors


def test_dense_A_shape_overhead():
    P = params_init(50)
    isis = np.arange(P.Kp + 4, dtype=np.uint32)
    A = dense_A(P, isis, overhead=4)
    assert A.shape == (P.L + 4, P.L)
