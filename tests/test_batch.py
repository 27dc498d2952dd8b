"""Object-level batched encoding matches the per-block API bit-for-bit."""

import numpy as np

from nanorq_tpu.codec.api import Encoder
from nanorq_tpu.codec.batch import generate, load_object, repair_symbols, source_symbol
from nanorq_tpu.io.ioctx import MemoryIO


def test_batched_object_encode_matches_per_block():
    rng = np.random.default_rng(5)
    size, T = 50_000, 128
    data = rng.integers(0, 256, size, dtype=np.uint8)
    enc = Encoder(size, T, Al=4, Z=5)  # 5 blocks, long+short K
    io = MemoryIO(data)

    batch = load_object(enc, io)
    assert len({int(k) for k in batch.Ks}) >= 1
    generate(batch)
    rep = repair_symbols(batch, n_repair=4)

    enc2 = Encoder(size, T, Al=4, Z=5)
    for b, sbn in enumerate(batch.sbns):
        K = enc2.block_symbols(sbn)
        esis = np.r_[np.arange(K), np.arange(K, K + 4)]
        want = enc2.encode_batch(sbn, esis, io)
        for esi in range(K):
            assert np.array_equal(source_symbol(batch, b, esi), want[esi])
        assert np.array_equal(rep[b], want[K:])


def test_batched_object_encode_sharded_mesh():
    import jax

    from nanorq_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(6)
    T = 128
    enc = Encoder(80_000, T, Al=4, Z=8)  # 8 blocks over 8 virtual devices
    data = rng.integers(0, 256, 80_000, dtype=np.uint8)
    io = MemoryIO(data)
    batch = load_object(enc, io)
    generate(batch, mesh=make_mesh(jax.devices()))
    rep = repair_symbols(batch, n_repair=2)
    enc2 = Encoder(80_000, T, Al=4, Z=8)
    for b, sbn in enumerate(batch.sbns):
        K = enc2.block_symbols(sbn)
        want = enc2.encode_batch(sbn, np.arange(K, K + 2), io)
        assert np.array_equal(rep[b], want)
