"""Residual decode arm: solve-free repair against the canonical factorization.

The arm decodes X = R (y ^ W D0) where W are canonical per-ISI combination
rows (cache.res_wrows), G = W[:, gaps] and R its native left inverse
(native.res_rinv).  Tests cover the native inverse, bit-exact round trips
through the production repair_all, padding (K < K'), zero-overhead patterns,
rank deficiency, and the auto-policy routing.
"""

import numpy as np
import pytest

from nanorq_tpu.codec import cache as cc
from nanorq_tpu.codec.api import Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.gf256.tables import GF_MUL
from nanorq_tpu.io.ioctx import MemoryIO
from nanorq_tpu.native import native_available, res_rinv

pytestmark = pytest.mark.skipif(
    not native_available(), reason="residual arm requires the native solver"
)


def _gf_matmul(A, B):
    out = np.zeros((A.shape[0], B.shape[1]), np.uint8)
    for r in range(A.shape[0]):
        for c in range(B.shape[1]):
            acc = 0
            for k in range(A.shape[1]):
                acc ^= GF_MUL[A[r, k], B[k, c]]
            out[r, c] = acc
    return out


def test_res_rinv_left_inverse():
    rng = np.random.default_rng(3)
    Gs = [
        rng.integers(0, 256, (nr, g), dtype=np.uint8)
        for nr, g in [(11, 6), (20, 17), (5, 5), (33, 1)]
    ]
    Rs, statuses = res_rinv(Gs)
    for G, R, s in zip(Gs, Rs, statuses):
        # random GF(256) matrices with nr >= g are full rank w.h.p.
        assert s == 0
        eye = _gf_matmul(R, G)
        assert np.array_equal(eye, np.eye(G.shape[1], dtype=np.uint8))


def test_res_rinv_rank_deficient():
    rng = np.random.default_rng(4)
    G = rng.integers(0, 256, (8, 5), dtype=np.uint8)
    G[:, 3] = G[:, 1]  # dependent columns: no left inverse exists
    Rs, statuses = res_rinv([G])
    assert statuses[0] == 1


def _roundtrip(K, nb=3, loss=0.08, overhead_frac=0.05, seed=11, backend="res"):
    T = 96
    rng = np.random.default_rng(seed)
    F = K * T * nb
    data = rng.integers(0, 256, F, dtype=np.uint8)
    payloads = data.reshape(nb * K, T)
    enc = Encoder(F, T, Al=4, Z=nb)
    src = MemoryIO(data)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out = np.zeros(F, np.uint8)
    io = MemoryIO(out)
    for sbn in range(nb):
        gaps = np.nonzero(rng.random(K) < loss)[0]
        if gaps.size == 0:
            gaps = np.array([0])
        nrep = gaps.size + max(0, int(overhead_frac * K))
        rep_esis = np.arange(K, K + nrep)
        rep_pl = enc.encode_batch(sbn, rep_esis, src)
        keep = np.setdiff1d(np.arange(K), gaps)
        dec.add_symbols(payloads[sbn * K + keep], [make_tag(sbn, int(e)) for e in keep], io)
        dec.add_symbols(rep_pl, [make_tag(sbn, int(e)) for e in rep_esis], io)
    assert dec.repair_all(io, backend=backend)
    assert np.array_equal(out, data)


@pytest.mark.parametrize("K", [18, 100, 500, 1200])
def test_residual_roundtrip(K):
    _roundtrip(K)


def test_residual_roundtrip_padding():
    # K=77 pads to K'=82: gap columns and padding rows interact
    _roundtrip(77, nb=2, loss=0.15)


def test_residual_zero_overhead():
    # exactly as many repair symbols as gaps: G is square
    _roundtrip(200, nb=2, loss=0.05, overhead_frac=0.0, seed=7)


def test_residual_heavy_loss():
    _roundtrip(300, nb=2, loss=0.4, overhead_frac=0.2, seed=9)


def test_residual_matches_host_arm():
    # both arms recover the identical bytes for the identical pattern
    for backend in ("res", "host"):
        _roundtrip(250, nb=2, loss=0.1, seed=21, backend=backend)


def test_explicit_res_backend_routes_residual():
    from nanorq_tpu.utils import stats

    before = stats.snapshot()["counters"].get("repair_res_blocks", 0)
    _roundtrip(150, nb=2, backend="res")
    assert stats.snapshot()["counters"].get("repair_res_blocks", 0) > before


def test_wrow_memo_reuse():
    # second identical request returns the memoized rows bit-exactly
    from nanorq_tpu.rfc.params import params_init

    cc.clear_decoder_cache()
    P = params_init(120)
    isis = np.arange(P.Kp, P.Kp + 9, dtype=np.uint32)
    W1 = cc.res_wrows(P, isis)
    W2 = cc.res_wrows(P, isis)
    assert np.array_equal(W1, W2)


def test_res_host_roundtrip_and_auto_policy():
    """backend="res_host" (native solve-free repair) round-trips bit-exact,
    and the auto policy routes cold small-K' patterns through it."""
    import os

    import numpy as np

    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO
    from nanorq_tpu.native import native_available
    from nanorq_tpu.utils import stats

    if not native_available():
        pytest.skip("native library unavailable")
    K, nb, T = 60, 6, 96
    rng = np.random.default_rng(9)
    F = K * T * nb
    data = rng.integers(0, 256, F, dtype=np.uint8)
    payloads = data.reshape(nb * K, T)
    enc = Encoder(F, T, Al=8, Z=nb)
    src = MemoryIO(data)

    def fresh():
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        out = np.zeros(F, np.uint8)
        io = MemoryIO(out)
        rng2 = np.random.default_rng(10)
        for sbn in range(nb):
            gaps = np.nonzero(rng2.random(K) < 0.1)[0]
            rep = np.arange(K, K + gaps.size + 2)
            pl = enc.encode_batch(sbn, rep, src)
            keep = np.setdiff1d(np.arange(K), gaps)
            dec.add_symbols(payloads[sbn * K + keep], [make_tag(sbn, int(e)) for e in keep], io)
            dec.add_symbols(pl, [make_tag(sbn, int(e)) for e in rep], io)
        return dec, out, io

    dec, out, io = fresh()
    cc.clear_decoder_cache()
    assert dec.repair_all(io, backend="res_host")
    assert np.array_equal(out, data)

    # auto at small K' routes cold blocks through the host residual arm
    dec, out, io = fresh()
    cc.clear_decoder_cache()
    before = stats.snapshot()["counters"].get("repair_res_host_blocks", 0)
    assert dec.repair_all(io)  # auto
    assert np.array_equal(out, data)
    assert stats.snapshot()["counters"].get("repair_res_host_blocks", 0) > before
