"""GF(256) table and field-axiom tests (RFC 6330 s5.7.3)."""

import numpy as np

from nanorq_tpu.gf256.tables import GF_MUL, MUL_HI, MUL_LO, OCT_EXP, OCT_INV, OCT_LOG
from nanorq_tpu.gf256.numpy_ops import gf_matmul, gf_solve_dense


def test_exp_log_roundtrip():
    x = np.arange(1, 256)
    assert np.array_equal(OCT_EXP[OCT_LOG[x].astype(int)], x)
    assert np.array_equal(OCT_EXP[255:510], OCT_EXP[0:255])


def test_rfc_spec_values():
    # normative prefix of OCT_EXP from RFC 6330 s5.7.3
    assert list(OCT_EXP[:12]) == [1, 2, 4, 8, 16, 32, 64, 128, 29, 58, 116, 232]
    assert OCT_EXP[254] == 142


def test_inverse():
    x = np.arange(1, 256)
    assert np.all(GF_MUL[x, OCT_INV[x]] == 1)
    assert OCT_INV[1] == 1


def test_mul_axioms():
    rng = np.random.default_rng(1)
    a, b, c = (rng.integers(0, 256, 4096, dtype=np.uint8) for _ in range(3))
    assert np.array_equal(GF_MUL[a, b], GF_MUL[b, a])
    assert np.array_equal(GF_MUL[GF_MUL[a, b], c], GF_MUL[a, GF_MUL[b, c]])
    # distributivity over XOR
    assert np.array_equal(GF_MUL[a, b ^ c], GF_MUL[a, b] ^ GF_MUL[a, c])
    assert np.all(GF_MUL[a, 1] == a)
    assert np.all(GF_MUL[a, 0] == 0)


def test_nibble_decomposition():
    a = np.arange(256, dtype=np.uint8)
    for beta in [0, 1, 2, 7, 142, 255]:
        want = GF_MUL[beta, a]
        got = MUL_LO[beta, a & 15] ^ MUL_HI[beta, a >> 4]
        assert np.array_equal(got, want), beta


def test_dense_solve_roundtrip():
    rng = np.random.default_rng(2)
    n = 40
    A = rng.integers(0, 256, (n, n), dtype=np.uint8)
    X = rng.integers(0, 256, (n, 7), dtype=np.uint8)
    D = gf_matmul(A, X)
    Xs = gf_solve_dense(A, D)
    if Xs is not None:  # random matrix can be singular
        assert np.array_equal(Xs, X)


def test_dense_solve_singular():
    A = np.zeros((3, 3), np.uint8)
    A[0, 0] = 1
    A[1] = A[0]
    assert gf_solve_dense(A, np.zeros((3, 2), np.uint8)) is None
