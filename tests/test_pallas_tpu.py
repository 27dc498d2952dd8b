"""Pallas TPU kernel parity vs the XLA/NumPy formulations.

The main suite runs forced-CPU (conftest), where these tests skip; run them
on real hardware with `make test-tpu` (NANORQ_TEST_TPU=1 disables the CPU
forcing).  Each kernel is compared bit-exactly against its gfmat/bitplane
counterpart on random inputs, so on-chip kernel regressions are caught
without a full benchmark run (ADVICE r1: the bench byte-equality gate was
the only on-chip coverage).
"""

import os

import numpy as np
import pytest


def _tpu():
    import jax

    return jax.default_backend() in ("tpu", "axon")


pytestmark = pytest.mark.skipif(
    not os.environ.get("NANORQ_TEST_TPU"),
    reason="TPU kernel parity tests need NANORQ_TEST_TPU=1 and real hardware",
)


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if not _tpu():
        pytest.skip("no TPU backend available")


def test_gf2_matmul_parity():
    import jax.numpy as jnp

    from nanorq_tpu.gf256.bitplane import gf2_matmul_bytes
    from nanorq_tpu.ops.pallas_kernels import gf2_matmul_pallas

    rng = np.random.default_rng(0)
    for m, k, t in [(256, 256, 2048), (512, 512, 5120), (64, 1024, 1280 * 4)]:
        X = rng.integers(0, 256, (k, t), dtype=np.uint8)
        B = rng.integers(0, 2, (m, k), dtype=np.uint8)
        got = np.asarray(gf2_matmul_pallas(jnp.asarray(B), jnp.asarray(X)))
        assert np.array_equal(got, gf2_matmul_bytes(B, X)), (m, k, t)


def test_gf2_matmul_mtiled_parity():
    """m-grid tiling (the Wut matmul shape: tall lhs, m >> VMEM acc block)."""
    import jax.numpy as jnp

    from nanorq_tpu.gf256.bitplane import gf2_matmul_bytes
    from nanorq_tpu.ops.pallas_kernels import gf2_matmul_pallas

    rng = np.random.default_rng(1)
    for m, k, t, mb in [(2048, 512, 1280 * 2, 512), (4096, 1024, 1280, 256), (1024, 2048, 1280, 512)]:
        X = rng.integers(0, 256, (k, t), dtype=np.uint8)
        B = rng.integers(0, 2, (m, k), dtype=np.uint8)
        got = np.asarray(gf2_matmul_pallas(jnp.asarray(B), jnp.asarray(X), mb=mb))
        assert np.array_equal(got, gf2_matmul_bytes(B, X)), (m, k, t, mb)


def test_gf2mm_wide_nonstandard_lpad():
    """_gf2mm_wide must handle any Lpad the CB knob can produce (CB is a
    public tuning parameter; Lpad is only guaranteed a multiple of CB)."""
    import jax.numpy as jnp

    from nanorq_tpu.gf256.bitplane import gf2_matmul_bytes
    from nanorq_tpu.ops.replay import _gf2mm_wide

    rng = np.random.default_rng(4)
    for m in (640, 1920, 520):  # divisors: 128, 128, 8
        k, t = 512, 1280
        X = rng.integers(0, 256, (k, t), dtype=np.uint8)
        B = rng.integers(0, 2, (m, k), dtype=np.uint8)
        got = np.asarray(_gf2mm_wide(True, jnp.asarray(B), jnp.asarray(X)))
        assert np.array_equal(got, gf2_matmul_bytes(B, X)), m


def test_gf256_matmul_parity():
    import jax.numpy as jnp

    from nanorq_tpu.gf256.numpy_ops import gf_matmul
    from nanorq_tpu.ops.pallas_kernels import companion_bits_blocked, gf256_matmul_pallas

    rng = np.random.default_rng(1)
    for m, k, kb, t in [(16, 256, 256, 2048), (32, 1024, 128, 5120), (64, 512, 512, 1280 * 4)]:
        X = rng.integers(0, 256, (k, t), dtype=np.uint8)
        M = rng.integers(0, 256, (m, k), dtype=np.uint8)
        Mb = companion_bits_blocked(M, kb)
        got = np.asarray(gf256_matmul_pallas(jnp.asarray(Mb), jnp.asarray(X), kb=kb))
        assert np.array_equal(got, gf_matmul(M, X)), (m, k, kb, t)


def test_gather_xor_parity():
    import jax.numpy as jnp

    from nanorq_tpu.ops.pallas_kernels import gather_xor_pallas

    rng = np.random.default_rng(2)
    for S, n, w, t in [(1072, 1024, 16, 2048), (517, 203, 6, 5120), (4099, 512, 1, 1280 * 8)]:
        src = rng.integers(0, 256, (S, t), dtype=np.uint8)
        idx = rng.integers(0, S, (n, w)).astype(np.int32)
        got = np.asarray(gather_xor_pallas(jnp.asarray(src), jnp.asarray(idx)))
        assert np.array_equal(got, np.bitwise_xor.reduce(src[idx], axis=1)), (S, n, w, t)


def test_canonical_decode_replay_parity_on_chip():
    """Frozen-layout (heavy-reordered, spill-range) decode schedules must
    replay bit-exactly on the TPU kernels vs the NumPy oracle."""
    import jax.numpy as jnp

    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.ops.replay import device_arrays, replay_device
    from nanorq_tpu.precode import device_schedule as dsm
    from nanorq_tpu.precode.solver import solve_state
    from nanorq_tpu.rfc.params import params_init

    rng = np.random.default_rng(5)
    K, T = 2000, 1280
    P = params_init(K)
    ov = max(1, K // 20)
    ds = None
    for s in range(dsm._FREEZE_AFTER + 2):  # walk past the freeze
        r2 = np.random.default_rng(600 + s)
        gaps = np.nonzero(r2.random(K) < 0.06)[0]
        isis = np.arange(P.Kp + ov, dtype=np.uint32)
        rep = (np.arange(K, K + gaps.size + ov) + (P.Kp - K)).astype(np.uint32)
        isis[gaps] = rep[: gaps.size]
        isis[P.Kp :] = rep[gaps.size :]
        st = solve_state(P, cc._patched_rows(P, isis, ov), ov)
        ds = dsm.compile_device(st, canonical=True)
    D = np.zeros((ds.M_pad, T), np.uint8)
    D[:K] = rng.integers(0, 256, (K, T), dtype=np.uint8)
    got = np.asarray(replay_device(device_arrays(ds), jnp.asarray(D)))
    want = dsm.replay_structured_numpy(D, ds)
    assert np.array_equal(got, want)


def test_full_replay_parity_on_chip():
    """End-to-end structured replay on TPU vs the NumPy oracle executor."""
    import jax.numpy as jnp

    from nanorq_tpu.codec.cache import encoder_schedule
    from nanorq_tpu.ops.replay import device_arrays, replay_device
    from nanorq_tpu.precode.device_schedule import replay_structured_numpy
    from nanorq_tpu.rfc.params import params_init

    rng = np.random.default_rng(3)
    K, T, B = 1000, 1280, 1
    P = params_init(K)
    ds = encoder_schedule(P.Kp)
    D = np.zeros((ds.M_pad, B * T), np.uint8)
    D[:K] = rng.integers(0, 256, (K, B * T), dtype=np.uint8)
    got = np.asarray(replay_device(device_arrays(ds), jnp.asarray(D)))
    want = replay_structured_numpy(D, ds)
    assert np.array_equal(got, want)


def test_w_matmul_gf256_parity_on_chip():
    """GF(256) W path (ops/wpath.py stage_w/w_matmul, the HDPC-forced decode
    plan) bit-exact on real hardware vs the NumPy field oracle — both the
    128-aligned pallas dispatch and the odd-width XLA fallback."""
    import jax.numpy as jnp

    from nanorq_tpu.gf256.numpy_ops import gf_matmul
    from nanorq_tpu.ops.wpath import stage_w, w_matmul

    rng = np.random.default_rng(8)
    for m, k, t in [(24, 256, 1280), (40, 512, 1280 * 2), (17, 128, 1000)]:
        W = rng.integers(0, 256, (m, k), dtype=np.uint8)
        D = rng.integers(0, 256, (k + 5, t), dtype=np.uint8)
        st = stage_w(W, binary=False)
        got = np.asarray(w_matmul(st, jnp.asarray(D)))[:m]
        assert np.array_equal(got, gf_matmul(W, D[:k])), (m, k, t)


def test_w_matmul_gf2_parity_on_chip():
    """Binary W path (dense-form stage_w + gathered-form stage_w_gf2) on
    chip, including a non-128-multiple width that rides the XLA fallback."""
    import jax.numpy as jnp

    from nanorq_tpu.gf256.bitplane import gf2_matmul_bytes
    from nanorq_tpu.ops.wpath import stage_w, stage_w_gf2, w_matmul, w_matmul_gf2

    rng = np.random.default_rng(9)
    for m, k, t in [(64, 512, 1280), (33, 256, 996)]:
        W = rng.integers(0, 2, (m, k), dtype=np.uint8)
        D = rng.integers(0, 256, (k + 3, t), dtype=np.uint8)
        got = np.asarray(w_matmul(stage_w(W, binary=True), jnp.asarray(D)))[:m]
        assert np.array_equal(got, gf2_matmul_bytes(W, D[:k])), ("dense", m, k, t)
    # gathered form: rows picked out of a taller D (take_rows under the hood)
    m, S, kq, t = 48, 700, 512, 1280
    W = rng.integers(0, 2, (m, kq), dtype=np.uint8)
    rows = rng.choice(S, size=kq, replace=False).astype(np.int32)
    D = rng.integers(0, 256, (S, t), dtype=np.uint8)
    st = stage_w_gf2(np.packbits(W, axis=-1, bitorder="little"), rows)
    got = np.asarray(w_matmul_gf2(st, jnp.asarray(D)))[:m]
    assert np.array_equal(got, gf2_matmul_bytes(W, D[rows]))


def test_w_batch_dispatch_parity_on_chip():
    """Stacked multi-block W dispatch (_w_gf2_batch_jit/_w_gf256_batch_jit,
    the repair_all batching path) bit-exact on chip."""
    import jax.numpy as jnp

    from nanorq_tpu.gf256.bitplane import companion_bits, gf2_matmul_bytes
    from nanorq_tpu.gf256.numpy_ops import gf_matmul
    from nanorq_tpu.ops.wpath import _w_gf2_batch_jit, _w_gf256_batch_jit

    rng = np.random.default_rng(10)
    nb, m, kq, Mp, t = 4, 32, 256, 300, 1280
    bits = rng.integers(0, 256, (nb, m, kq // 8), dtype=np.uint8)
    rows = rng.integers(0, Mp, (nb, kq)).astype(np.int32)
    D = rng.integers(0, 256, (nb, Mp, t), dtype=np.uint8)
    got = np.asarray(_w_gf2_batch_jit(jnp.asarray(bits), jnp.asarray(rows), jnp.asarray(D)))
    for j in range(nb):
        W = np.unpackbits(bits[j], axis=-1, bitorder="little")
        assert np.array_equal(got[j], gf2_matmul_bytes(W, D[j][rows[j]])), j

    k = 128
    Wb = rng.integers(0, 256, (nb, m, k), dtype=np.uint8)
    comp = np.stack(
        [np.packbits(companion_bits(Wb[j]), axis=-1, bitorder="little") for j in range(nb)]
    )
    D2 = rng.integers(0, 256, (nb, k, t), dtype=np.uint8)
    got2 = np.asarray(_w_gf256_batch_jit(jnp.asarray(comp), jnp.asarray(D2)))
    for j in range(nb):
        assert np.array_equal(got2[j], gf_matmul(Wb[j], D2[j])), j


def test_odd_width_fallbacks_on_chip():
    """Non-1024-aligned payload widths ride the jnp.take fallbacks in
    ops/replay.take_rows/_select_rows and ops/lt._lt_apply_sorted; a full
    encode->drop->repair round trip at T=96 pins them bit-exact on chip."""
    import jax

    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO

    rng = np.random.default_rng(11)
    K, T = 1200, 96  # structured-plan territory at default knobs? K'=1281 < WPATH_MAX_KP
    data = rng.integers(0, 256, K * T, dtype=np.uint8)
    enc = Encoder(data.size, T, Al=1)
    src = MemoryIO(data)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out = np.zeros(data.size, np.uint8)
    io = MemoryIO(out)
    gaps = np.sort(rng.choice(K, size=40, replace=False))
    keep = np.setdiff1d(np.arange(K), gaps)
    rep_esis = np.arange(K, K + gaps.size + 5)
    rep_pl = enc.encode_batch(0, rep_esis, src)
    dec.add_symbols(data.reshape(K, T)[keep], [make_tag(0, int(e)) for e in keep], io)
    dec.add_symbols(rep_pl, [make_tag(0, int(e)) for e in rep_esis], io)
    assert dec.repair_all(io)
    assert np.array_equal(out, data)


def test_structured_decode_odd_width_on_chip(monkeypatch):
    """Same odd-width round trip FORCED onto the structured replay plan
    (device_schedule), covering its take_rows/_select_rows fallbacks."""
    import jax

    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO

    monkeypatch.setattr(cc, "WPATH_MAX_KP", 0)
    monkeypatch.setattr(cc, "WPATH_GF256_MAX_KP", 0)
    rng = np.random.default_rng(12)
    K, T = 500, 200
    data = rng.integers(0, 256, K * T, dtype=np.uint8)
    enc = Encoder(data.size, T, Al=1)
    src = MemoryIO(data)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out = np.zeros(data.size, np.uint8)
    io = MemoryIO(out)
    gaps = np.sort(rng.choice(K, size=25, replace=False))
    keep = np.setdiff1d(np.arange(K), gaps)
    rep_esis = np.arange(K, K + gaps.size + 4)
    rep_pl = enc.encode_batch(0, rep_esis, src)
    dec.add_symbols(data.reshape(K, T)[keep], [make_tag(0, int(e)) for e in keep], io)
    dec.add_symbols(rep_pl, [make_tag(0, int(e)) for e in rep_esis], io)
    assert dec.repair_all(io)
    assert np.array_equal(out, data)
