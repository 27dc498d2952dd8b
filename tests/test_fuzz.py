"""Property fuzz: random (size, T, loss, overhead) round trips, seeded.

The reference's only correctness gate is end-to-end byte equality
(SURVEY.md s4); this fuzz reproduces that across a randomized grid,
including loss rates high enough to force GF(256)/HDPC pivots and the
insufficient-repair failure/retry path.
"""

import numpy as np
import pytest

from nanorq_tpu.codec.api import SYM_ERR, Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.io.ioctx import MemoryIO


@pytest.mark.parametrize("seed", range(8))
def test_random_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    size = int(rng.integers(100, 60_000))
    T = int(rng.choice([17, 64, 100, 256, 512, 1280]))
    Al = int(rng.choice([1, 2, 4, 8]))
    Z = int(rng.choice([0, 1, 2, 4]))
    loss = float(rng.uniform(0, 0.35))
    overhead = int(rng.integers(2, 8))

    data = rng.integers(0, 256, size, dtype=np.uint8)
    out = np.zeros(size, np.uint8)
    enc = Encoder(size, T, Al=Al, Z=Z)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    io_in, io_out = MemoryIO(data), MemoryIO(out)

    for sbn in range(enc.num_blocks):
        K = enc.block_symbols(sbn)
        kept = [e for e in range(K) if rng.random() >= loss]
        dropped = K - len(kept)
        esis = kept + list(range(K, K + dropped + overhead))
        payloads = enc.encode_batch(sbn, np.array(esis), io_in)
        for esi, p in zip(esis, payloads):
            assert dec.add_symbol(p.tobytes(), make_tag(sbn, esi), io_out) != SYM_ERR
        ok = dec.repair_block(io_out, sbn)
        retries = 0
        while not ok and retries < 4:  # fountain retry loop: feed more repair
            more = list(range(K + dropped + overhead + 4 * retries,
                              K + dropped + overhead + 4 * (retries + 1)))
            payloads = enc.encode_batch(sbn, np.array(more), io_in)
            for esi, p in zip(more, payloads):
                dec.add_symbol(p.tobytes(), make_tag(sbn, esi), io_out)
            ok = dec.repair_block(io_out, sbn)
            retries += 1
        assert ok, f"seed={seed} sbn={sbn} unrecoverable"
    assert np.array_equal(out, data), f"seed={seed}"
