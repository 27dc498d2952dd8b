"""Max-scale and sub-blocking conformance (reference ubsan runs K=50000,
Makefile:95-99; BASELINE.json configs 3-5; decoder N>1 path nanorq.c:353).

These are the heaviest tests in the suite (native host solver + forced-CPU
XLA replay); each stays in the seconds-to-a-couple-minutes range.
"""

import numpy as np
import pytest

from nanorq_tpu.codec.api import SYM_ADDED, SYM_IGN, Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.io.ioctx import MemoryIO


def _lossy_roundtrip(enc: Encoder, data: np.ndarray, loss_pct: float, seed: int,
                     overhead: int = 5) -> None:
    out = np.zeros(len(data), np.uint8)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    assert dec.scheme == enc.scheme
    io_in, io_out = MemoryIO(data), MemoryIO(out)
    rng = np.random.default_rng(seed)
    for sbn in range(enc.num_blocks):
        K = enc.block_symbols(sbn)
        kept = np.nonzero(rng.random(K) * 100 >= loss_pct)[0]
        nrep = (K - kept.size) + overhead
        esis = np.concatenate([kept, np.arange(K, K + nrep)])
        payloads = enc.encode_batch(sbn, esis, io_in)
        sts = dec.add_symbols(payloads, [make_tag(sbn, int(e)) for e in esis], io_out)
        assert all(s in (SYM_ADDED, SYM_IGN) for s in sts)
        assert dec.repair_block(io_out, sbn), f"repair failed sbn={sbn}"
    assert np.array_equal(out, data)


def test_subblock_interleaved_roundtrip():
    """N>1 end-to-end: encode with sub-block interleaving, decode from OTI,
    verify real payload bytes land at the interleaved offsets."""
    rng = np.random.default_rng(21)
    F, T = 50_001, 256  # short final symbol too
    data = rng.integers(0, 256, F, dtype=np.uint8)
    enc = Encoder(F, T, Al=4, Z=2, N=4)
    assert enc.scheme.N == 4
    _lossy_roundtrip(enc, data, loss_pct=8.0, seed=22)


def test_subblock_uneven_units_roundtrip():
    """N that does not divide T/Al (long + short sub-blocks both exercised)."""
    rng = np.random.default_rng(23)
    F, T = 20_000, 120  # T/Al = 30 units over N=7 -> IL=5,IS=4 mix
    data = rng.integers(0, 256, F, dtype=np.uint8)
    enc = Encoder(F, T, Al=4, Z=1, N=7)
    _lossy_roundtrip(enc, data, loss_pct=10.0, seed=24)


@pytest.mark.slow
def test_z256_max_blocks_roundtrip():
    """Z = Z_MAX = 256 source blocks in one object, lossy, decoded per block."""
    from nanorq_tpu.rfc.tables import Z_MAX

    rng = np.random.default_rng(31)
    T, Kblk = 64, 10
    F = Z_MAX * Kblk * T - 17  # final block gets a short symbol
    data = rng.integers(0, 256, F, dtype=np.uint8)
    enc = Encoder(F, T, Al=8, Z=Z_MAX)
    assert enc.num_blocks == Z_MAX
    _lossy_roundtrip(enc, data, loss_pct=15.0, seed=32, overhead=3)


@pytest.mark.slow
def test_bigk_hdpc_roundtrip():
    """K' = 56403 (Table 2 max, HDPC-dominated solve) encode+decode round
    trip with loss through the public API on the native solver."""
    from nanorq_tpu.rfc.params import params_init
    from nanorq_tpu.rfc.tables import K_PADDED

    K = int(K_PADDED[-1])  # 56403
    assert params_init(K).Kp == K
    rng = np.random.default_rng(41)
    T = 64
    F = K * T - 5
    data = rng.integers(0, 256, F, dtype=np.uint8)
    enc = Encoder(F, T, Al=4, Z=1)
    assert enc.block_symbols(0) == K
    _lossy_roundtrip(enc, data, loss_pct=0.5, seed=42, overhead=8)
