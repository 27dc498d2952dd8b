"""Dense combination-matrix (W) path: parity vs the structured replay.

For any output ISI set G, W = G A^-1 must reproduce exactly what the
structured replay + LT combine produce: W @ D == lt(replay(D), G).  Covers
binary-only factorizations, HDPC-pivot (GF(256)) factorizations, encode
(systematic, all-K' outputs) and decode (patched system, gap outputs).
"""

import numpy as np
import pytest

from nanorq_tpu.codec.cache import _patched_rows
from nanorq_tpu.gf256.numpy_ops import gf_matmul
from nanorq_tpu.precode.device_schedule import compile_device, replay_structured_numpy
from nanorq_tpu.precode.matrix import binary_rows, lt_rows_csr
from nanorq_tpu.precode.solver import solve_state
from nanorq_tpu.rfc.params import params_init

pytestmark = pytest.mark.skipif(
    not __import__("nanorq_tpu.native", fromlist=["native_available"]).native_available(),
    reason="W path requires the native solver",
)


def _w_vs_replay(P, st, out_isis, rng):
    from nanorq_tpu.ops.lt import lt_combine, lt_plan
    from nanorq_tpu.ops.wpath import w_rows

    ds = compile_device(st)
    W, binary = w_rows(st, lt_rows_csr(np.asarray(out_isis, np.uint32), P), n_cols=ds.M_pad)
    if binary:
        assert W.max(initial=0) <= 1
    t = 256
    D = np.zeros((ds.M_pad, t), np.uint8)
    D[: st.M] = rng.integers(0, 256, (st.M, t), dtype=np.uint8)
    # constraint rows carry zero payload (LDPC rows are part of the binary
    # system; only the LT slots hold real bytes)
    D[P.Kp + st.overhead : st.M] = 0

    C = replay_structured_numpy(D, ds)
    import jax.numpy as jnp

    want = np.asarray(lt_combine(jnp.asarray(C), lt_plan(np.asarray(out_isis, np.uint32), P)))[: len(out_isis)]
    got = gf_matmul(W, D)
    assert np.array_equal(got, want), (P.Kp, len(out_isis), binary)
    return binary


@pytest.mark.parametrize("K", [10, 27, 100, 500, 1331])
def test_w_encode_parity(K):
    """W for the systematic all-K' output set == replay + LT of all K'."""
    P = params_init(K)
    st = solve_state(P, binary_rows(P))
    rng = np.random.default_rng(K)
    _w_vs_replay(P, st, np.arange(P.Kp, dtype=np.uint32), rng)


@pytest.mark.parametrize("K,seed", [(100, 0), (500, 1), (1331, 2)])
def test_w_decode_parity(K, seed):
    """W for a patched decode system's gap outputs == patched replay + LT."""
    P = params_init(K)
    rng = np.random.default_rng(seed)
    gaps = np.nonzero(rng.random(K) < 0.08)[0]
    if gaps.size == 0:
        gaps = np.array([0])
    ov = max(1, K // 20)
    isis = np.arange(P.Kp + ov, dtype=np.uint32)
    rep = (np.arange(K, K + gaps.size + ov) + (P.Kp - K)).astype(np.uint32)
    isis[gaps] = rep[: gaps.size]
    isis[P.Kp :] = rep[gaps.size :]
    st = solve_state(P, _patched_rows(P, isis, ov), ov)
    assert st is not None
    _w_vs_replay(P, st, gaps.astype(np.uint32), rng)


def test_w_branch_coverage():
    """Both W branches are really exercised: encoder systems always take
    HDPC pivots (M - H = L - H < L forces the GF(256) tail), while a decode
    system with >= H overhead rows solves binary-only."""
    P = params_init(500)
    st = solve_state(P, binary_rows(P))
    assert st.hdpc_used  # GF(256) branch

    K = 500
    rng = np.random.default_rng(3)
    gaps = np.nonzero(rng.random(K) < 0.06)[0]
    ov = 25  # > H
    isis = np.arange(P.Kp + ov, dtype=np.uint32)
    rep = (np.arange(K, K + gaps.size + ov) + (P.Kp - K)).astype(np.uint32)
    isis[gaps] = rep[: gaps.size]
    isis[P.Kp :] = rep[gaps.size :]
    std = solve_state(P, _patched_rows(P, isis, ov), ov)
    assert std is not None and not std.hdpc_used  # binary branch


@pytest.mark.parametrize("K,seed", [(100, 4), (500, 5), (1331, 6), (5000, 7)])
def test_w_gf2_gathered_parity(K, seed):
    """Bit-packed gathered-form W: unpack(Wbits) @ D[rows] must equal the
    byte-path W @ D on a binary decode factorization."""
    from nanorq_tpu.gf256.bitplane import gf2_matmul_bytes
    from nanorq_tpu.ops.wpath import w_rows, w_rows_gf2

    P = params_init(K)
    rng = np.random.default_rng(seed)
    gaps = np.nonzero(rng.random(K) < 0.08)[0]
    if gaps.size == 0:
        gaps = np.array([1])
    ov = max(P.H + 4, K // 20)  # enough overhead to solve binary-only
    isis = np.arange(P.Kp + ov, dtype=np.uint32)
    rep = (np.arange(K, K + gaps.size + ov) + (P.Kp - K)).astype(np.uint32)
    isis[gaps] = rep[: gaps.size]
    isis[P.Kp :] = rep[gaps.size :]
    st = solve_state(P, _patched_rows(P, isis, ov), ov)
    assert st is not None and not st.hdpc_used
    ds = compile_device(st)
    out = lt_rows_csr(gaps.astype(np.uint32), P)
    W, binary = w_rows(st, out, n_cols=ds.M_pad)
    assert binary
    Wbits, rows = w_rows_gf2(st, out, zero_row=ds.M_pad - 1)
    D = np.zeros((ds.M_pad, 256), np.uint8)
    D[: st.M] = rng.integers(0, 256, (st.M, 256), dtype=np.uint8)
    D[P.Kp + st.overhead : st.M] = 0
    want = gf_matmul(W, D)
    Wun = np.unpackbits(Wbits, axis=1, bitorder="little")[:, : rows.size]
    got = gf2_matmul_bytes(Wun, D[rows])
    assert np.array_equal(got, want), (K, gaps.size)


def test_w_matmul_gf2_device_parity():
    """stage_w_gf2 + w_matmul_gf2 (XLA on CPU) == host byte-path product."""
    from nanorq_tpu.ops.wpath import stage_w_gf2, w_matmul_gf2, w_rows, w_rows_gf2

    K = 500
    P = params_init(K)
    rng = np.random.default_rng(11)
    gaps = np.nonzero(rng.random(K) < 0.08)[0]
    ov = max(P.H + 4, K // 20)
    isis = np.arange(P.Kp + ov, dtype=np.uint32)
    rep = (np.arange(K, K + gaps.size + ov) + (P.Kp - K)).astype(np.uint32)
    isis[gaps] = rep[: gaps.size]
    isis[P.Kp :] = rep[gaps.size :]
    st = solve_state(P, _patched_rows(P, isis, ov), ov)
    ds = compile_device(st)
    out = lt_rows_csr(gaps.astype(np.uint32), P)
    W, _ = w_rows(st, out, n_cols=ds.M_pad)
    Wbits, rows = w_rows_gf2(st, out, zero_row=ds.M_pad - 1)
    D = np.zeros((ds.M_pad, 512), np.uint8)
    D[: P.Kp] = rng.integers(0, 256, (P.Kp, 512), dtype=np.uint8)
    import jax.numpy as jnp

    got = np.asarray(w_matmul_gf2(stage_w_gf2(Wbits, rows), jnp.asarray(D)))
    assert np.array_equal(got, gf_matmul(W, D))


def test_repair_block_wpath_equals_structured(monkeypatch):
    """The public repair path must produce identical bytes whichever plan
    decoder_plan picks: run a lossy round trip with the dense-W plan, then
    force the structured replay (WPATH_MAX_KP=0) on the same packets."""
    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO

    K, T = 200, 64
    rng = np.random.default_rng(21)
    F = K * T
    data = rng.integers(0, 256, F, dtype=np.uint8)
    enc = Encoder(F, T, Al=1, Z=1)
    src = MemoryIO(data)
    gaps = np.sort(rng.choice(K, size=30, replace=False))
    keep = np.setdiff1d(np.arange(K), gaps)
    rep_esis = np.arange(K, K + 50)  # 20 overhead > H: binary factorization
    rep_pl = enc.encode_batch(0, rep_esis, src)
    payloads = data.reshape(K, T)

    outs = []
    for max_kp in (cc.WPATH_MAX_KP, 0):
        monkeypatch.setattr(cc, "WPATH_MAX_KP", max_kp)
        cc.clear_decoder_cache()
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        out = np.zeros(F, np.uint8)
        io = MemoryIO(out)
        dec.add_symbols(payloads[keep], [make_tag(0, int(e)) for e in keep], io)
        dec.add_symbols(rep_pl, [make_tag(0, int(e)) for e in rep_esis], io)
        plan = cc.decoder_plan(dec.P, dec._repair_prepare(0)[1], dec._repair_prepare(0)[2])
        if max_kp:
            assert isinstance(plan, cc.WSchedule)
        else:
            assert not isinstance(plan, cc.WSchedule)
        assert dec.repair_block(io, 0)
        outs.append(out.copy())
    assert np.array_equal(outs[0], data) and np.array_equal(outs[1], data)


def test_repair_block_gf256_wplan(monkeypatch):
    """overhead < H forces HDPC pivots; the GF(256) W plan must still
    round-trip and match the structured plan byte-for-byte."""
    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO

    K, T = 100, 64
    rng = np.random.default_rng(5)
    F = K * T
    data = rng.integers(0, 256, F, dtype=np.uint8)
    enc = Encoder(F, T, Al=1, Z=1)
    src = MemoryIO(data)
    gaps = np.sort(rng.choice(K, size=8, replace=False))
    keep = np.setdiff1d(np.arange(K), gaps)
    rep_esis = np.arange(K, K + gaps.size + 3)  # 3 overhead < H
    rep_pl = enc.encode_batch(0, rep_esis, src)
    payloads = data.reshape(K, T)

    for gf256_kp in (cc.WPATH_GF256_MAX_KP, 0):
        monkeypatch.setattr(cc, "WPATH_GF256_MAX_KP", gf256_kp)
        cc.clear_decoder_cache()
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        out = np.zeros(F, np.uint8)
        io = MemoryIO(out)
        dec.add_symbols(payloads[keep], [make_tag(0, int(e)) for e in keep], io)
        dec.add_symbols(rep_pl, [make_tag(0, int(e)) for e in rep_esis], io)
        _, isis, ov = dec._repair_prepare(0)
        plan = cc.decoder_plan(dec.P, isis, ov)
        if gf256_kp:
            assert isinstance(plan, cc.WSchedule) and plan.W is not None
        else:
            assert not isinstance(plan, cc.WSchedule)
        assert dec.repair_block(io, 0)
        assert np.array_equal(out, data)


def test_w_matmul_device_parity():
    """stage_w + w_matmul (XLA backend on CPU) == host gf_matmul."""
    from nanorq_tpu.ops.wpath import stage_w, w_matmul, w_rows

    K = 500
    P = params_init(K)
    st = solve_state(P, binary_rows(P))
    ds = compile_device(st)
    rng = np.random.default_rng(7)
    W, binary = w_rows(st, lt_rows_csr(np.arange(P.Kp, dtype=np.uint32), P), n_cols=ds.M_pad)
    D = np.zeros((ds.M_pad, 512), np.uint8)
    D[: P.Kp] = rng.integers(0, 256, (P.Kp, 512), dtype=np.uint8)
    import jax.numpy as jnp

    got = np.asarray(w_matmul(stage_w(W, binary), jnp.asarray(D)))
    assert np.array_equal(got, gf_matmul(W, D))
