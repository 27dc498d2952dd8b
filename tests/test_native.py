"""Native C++ solver vs the Python oracle: equivalent states, identical output."""

import numpy as np
import pytest

from nanorq_tpu.precode.device_schedule import compile_device, replay_structured_numpy
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.solver import _solve_core
from nanorq_tpu.rfc.params import params_init

native = pytest.importorskip("nanorq_tpu.native")
if not native.native_available():
    pytest.skip("no compiler for the native solver", allow_module_level=True)


@pytest.mark.parametrize("K", [1, 10, 100, 500, 1000])
def test_native_matches_python_replay(K):
    P = params_init(K)
    rc = binary_rows(P)
    st_py = _solve_core(P, rc)
    st_c = native.solve_native(P, rc)
    assert st_c is not None
    # mirrored algorithm: same pivot count and inactivation size
    assert (st_c.i, st_c.u) == (st_py.i, st_py.u)
    ds_py = compile_device(st_py, CB=128)
    ds_c = compile_device(st_c, CB=128)
    rng = np.random.default_rng(K)
    D = np.zeros((max(ds_py.M_pad, ds_c.M_pad), 16), np.uint8)
    D[:K] = rng.integers(0, 256, (K, 16), dtype=np.uint8)
    C1 = replay_structured_numpy(D[: ds_py.M_pad], ds_py)
    C2 = replay_structured_numpy(D[: ds_c.M_pad], ds_c)
    assert np.array_equal(C1, C2)


def test_native_decode_pattern_and_failure():
    P = params_init(100)
    rng = np.random.default_rng(1)
    # patched decode system solves
    isis = np.arange(P.Kp + 2, dtype=np.uint32)
    gaps = rng.choice(100, 5, replace=False)
    isis[gaps] = np.arange(100, 105) + (P.Kp - 100)
    isis[P.Kp :] = np.arange(105, 107) + (P.Kp - 100)
    st = native.solve_native(P, binary_rows(P, isis, 2), 2)
    assert st is not None and st.overhead == 2
    # duplicate rows -> rank deficient -> None
    bad = np.arange(P.Kp, dtype=np.uint32)
    bad[0] = 5
    bad[5] = 5
    assert native.solve_native(P, binary_rows(P, bad)) is None
