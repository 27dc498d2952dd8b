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


def test_host_repair_roundtrip_forced():
    """backend="host": the native CPU decode arm (solve + substitution +
    LT combine fused in C) round-trips bit-exact, including HDPC-pivot
    patterns (overhead < H) and odd widths."""
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO
    from nanorq_tpu.native import native_available
    from nanorq_tpu.utils import stats

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(21)
    for K, T, nrep_extra in [(64, 48, 1), (500, 1280, 2), (1000, 96, 30)]:
        data = rng.integers(0, 256, K * T, dtype=np.uint8)
        enc = Encoder(data.size, T, Al=1, Z=1)
        src = MemoryIO(data)
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        out = np.zeros(data.size, np.uint8)
        io = MemoryIO(out)
        gaps = np.sort(rng.choice(K, size=max(2, K // 16), replace=False))
        keep = np.setdiff1d(np.arange(K), gaps)
        rep_esis = np.arange(K, K + gaps.size + nrep_extra)
        rep_pl = enc.encode_batch(0, rep_esis, src)
        dec.add_symbols(data.reshape(K, T)[keep], [make_tag(0, int(e)) for e in keep], io)
        dec.add_symbols(rep_pl, [make_tag(0, int(e)) for e in rep_esis], io)
        c0 = stats.snapshot()["counters"].get("repair_host_blocks", 0)
        assert dec.repair_all(io, backend="host")
        c1 = stats.snapshot()["counters"].get("repair_host_blocks", 0)
        assert c1 - c0 >= 1, "host arm not taken"
        assert np.array_equal(out, data), (K, T)


def test_adaptive_backend_cold_host_warm_device():
    """auto policy: a cold pattern decodes on the host arm; once its device
    plan is cached (via an explicit device decode), the same pattern
    replays on device."""
    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO
    from nanorq_tpu.native import native_available
    from nanorq_tpu.utils import stats

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(22)
    K, T = 128, 64
    data = rng.integers(0, 256, K * T, dtype=np.uint8)
    enc = Encoder(data.size, T, Al=1, Z=1)
    src = MemoryIO(data)
    gaps = np.array([3, 40, 77])
    keep = np.setdiff1d(np.arange(K), gaps)
    rep_esis = np.arange(K, K + 5)
    rep_pl = enc.encode_batch(0, rep_esis, src)

    def load():
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        out = np.zeros(data.size, np.uint8)
        io = MemoryIO(out)
        dec.add_symbols(data.reshape(K, T)[keep], [make_tag(0, int(e)) for e in keep], io)
        dec.add_symbols(rep_pl, [make_tag(0, int(e)) for e in rep_esis], io)
        return dec, out, io

    def cpu_blocks():
        c = stats.snapshot()["counters"]
        # small K': the auto policy may pick the solve-free residual arm
        return c.get("repair_host_blocks", 0) + c.get("repair_res_host_blocks", 0)

    cc.clear_decoder_cache()
    dec, out, io = load()
    c0 = cpu_blocks()
    assert dec.repair_all(io)  # cold: auto -> a native CPU arm
    assert cpu_blocks() - c0 == 1
    assert np.array_equal(out, data)

    dec, out, io = load()
    assert dec.repair_all(io, backend="device")  # caches the device plan
    assert np.array_equal(out, data)
    dec, out, io = load()
    c0 = cpu_blocks()
    assert dec.repair_all(io)  # warm: auto -> device arm
    assert cpu_blocks() - c0 == 0
    assert np.array_equal(out, data)


def test_lt_row_native_parity():
    """The native LT row generator (nrq_lt_row, used by the shared-base
    repair prep) matches rfc/tuples.py lt_indices for random ISIs."""
    from nanorq_tpu.native import lt_row_native, native_available
    from nanorq_tpu.rfc.params import params_init
    from nanorq_tpu.rfc.tuples import lt_indices

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for K in (10, 100, 1017, 5000, 25000):
        P = params_init(K)
        isis = rng.integers(0, 2 * P.Kp, 64, dtype=np.uint32)
        idx, valid = lt_indices(isis, P)
        for j, X in enumerate(isis):
            want = idx[j][valid[j]]
            got = lt_row_native(int(X), P)
            assert got is not None
            assert sorted(got.tolist()) == sorted(want.tolist()), (K, int(X))
