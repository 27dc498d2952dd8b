"""End-to-end codec tests: OTI, partitioning, round trips with loss."""

import numpy as np
import pytest

from nanorq_tpu.codec.api import SYM_ADDED, SYM_DUP, SYM_ERR, SYM_IGN, Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag, pack_oti_common, split_tag, unpack_oti_common
from nanorq_tpu.codec.oti import pack_oti_scheme, unpack_oti_scheme
from nanorq_tpu.codec.partition import Partition, make_scheme, symbol_ranges
from nanorq_tpu.io.ioctx import MemoryIO


def test_oti_roundtrip():
    for F, T in [(1, 1), (1280 * 100, 1280), (946270874880, 65535)]:
        c = pack_oti_common(F, T)
        assert unpack_oti_common(c) == (F, T)
    for Z, N, Al in [(1, 1, 1), (16, 1, 8), (256, 256, 4)]:
        s = pack_oti_scheme(Z, N, Al)
        assert unpack_oti_scheme(s) == (Z, N, Al)
    assert split_tag(make_tag(3, 12345)) == (3, 12345)


def test_partition_math():
    p = Partition.make(10, 3)  # 10 = 4+3+3
    assert (p.IL, p.IS, p.JL, p.JS) == (4, 3, 1, 2)
    assert [p.size(j) for j in range(3)] == [4, 3, 3]
    p = Partition.make(9, 3)
    assert (p.IL, p.JL) == (0, 0) and p.IS == 3 and p.JS == 3


def test_symbol_ranges_cover_object():
    s = make_scheme(F=10_000, T=1280, Al=8)
    seen = np.zeros(s.F, bool)
    for sbn in range(s.blocks):
        K = s.block_symbols(sbn)
        for esi in range(K):
            for off, length, col in symbol_ranges(s, sbn, esi, K):
                assert not seen[off : off + length].any()
                seen[off : off + length] = True
    assert seen.all()


def test_symbol_ranges_subblock_interleaving():
    """N>1 sub-blocking (decoder-side OTI accepts it): every byte of the
    object is covered exactly once, and per-symbol dest offsets are disjoint
    within the symbol (reference get_symbol_offset math, nanorq.c:114-128)."""
    from nanorq_tpu.codec.partition import Partition, Scheme

    F, T, Al, Z, N = 9_973, 256, 4, 3, 4
    Kt = (F + T - 1) // T
    s = Scheme(F=F, T=T, Al=Al, Z=Z, N=N, Kt=Kt,
               src=Partition.make(Kt, Z), sub=Partition.make(T // Al, N))
    seen = np.zeros(F, bool)
    for sbn in range(s.blocks):
        K = s.block_symbols(sbn)
        for esi in range(K):
            cols = np.zeros(T, bool)
            for off, length, col in symbol_ranges(s, sbn, esi, K):
                assert not seen[off : off + length].any()
                seen[off : off + length] = True
                assert not cols[col : col + length].any()
                cols[col : col + length] = True
    assert seen.all()


def _roundtrip(size, T, loss, seed, Z=0, K=0, overhead=5):
    rng = np.random.default_rng(seed)
    pyrng = np.random.default_rng(seed + 1)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    out = np.zeros(size, np.uint8)
    enc = Encoder(size, T, Al=8, K=K, Z=Z)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    io_in, io_out = MemoryIO(data), MemoryIO(out)
    for sbn in range(enc.num_blocks):
        nsym = enc.block_symbols(sbn)
        kept = [e for e in range(nsym) if pyrng.random() * 100 >= loss]
        dropped = nsym - len(kept)
        esis = kept + list(range(nsym, nsym + dropped + overhead))
        payloads = enc.encode_batch(sbn, np.array(esis), io_in)
        for esi, p in zip(esis, payloads):
            st = dec.add_symbol(p.tobytes(), make_tag(sbn, esi), io_out)
            assert st in (SYM_ADDED, SYM_IGN)
        assert dec.repair_block(io_out, sbn), f"repair failed sbn={sbn}"
    assert np.array_equal(out, data)
    return enc, dec


@pytest.mark.parametrize(
    "size,T,loss,seed",
    [
        (1000, 64, 0.0, 1),
        (10_000, 256, 6.0, 2),
        (100_000, 1280, 6.0, 3),
        (5_000, 128, 30.0, 4),
        (1279, 1280, 0.0, 5),  # single short symbol
        (1281, 1280, 50.0, 6),  # final short symbol
    ],
)
def test_memory_roundtrip(size, T, loss, seed):
    _roundtrip(size, T, loss, seed)


def test_multiblock_roundtrip():
    # force multiple source blocks (Z=4)
    _roundtrip(40_000, 256, 10.0, 7, Z=4)


def test_decoder_statuses():
    size, T = 4000, 256
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    enc = Encoder(size, T, Al=8, Z=1)  # one block so gaps remain after 1 add
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    io_in, io_out = MemoryIO(data), MemoryIO(np.zeros(size, np.uint8))
    p = enc.encode_batch(0, np.array([0]), io_in)[0]
    assert dec.add_symbol(p.tobytes(), make_tag(0, 0), io_out) == SYM_ADDED
    assert dec.add_symbol(p.tobytes(), make_tag(0, 0), io_out) == SYM_DUP
    assert dec.add_symbol(p.tobytes(), make_tag(99, 0), io_out) == SYM_ERR
    assert dec.add_symbol(p.tobytes(), make_tag(0, 1 << 23), io_out) == SYM_ERR
    assert dec.add_symbol(b"x", make_tag(0, 1), io_out) == SYM_ERR
    # IGN once the block needs no repair (reference gaps-first precedence)
    K = enc.block_symbols(0)
    payloads = enc.encode_batch(0, np.arange(1, K), io_in)
    for esi in range(1, K):
        dec.add_symbol(payloads[esi - 1].tobytes(), make_tag(0, esi), io_out)
    assert dec.add_symbol(p.tobytes(), make_tag(0, K), io_out) == SYM_IGN


def test_systematic_zero_loss_needs_no_repair():
    size, T = 8000, 256
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    out = np.zeros(size, np.uint8)
    enc = Encoder(size, T, Al=8)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    io_in, io_out = MemoryIO(data), MemoryIO(out)
    for sbn in range(enc.num_blocks):
        K = enc.block_symbols(sbn)
        payloads = enc.encode_batch(sbn, np.arange(K), io_in)
        for esi in range(K):
            dec.add_symbol(payloads[esi].tobytes(), make_tag(sbn, esi), io_out)
        assert dec.num_missing(sbn) == 0
        assert dec.repair_block(io_out, sbn)  # no-op, returns True
    assert np.array_equal(out, data)


def test_insufficient_repair_returns_false():
    size, T = 4000, 256
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    enc = Encoder(size, T, Al=8, Z=1)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    io_in, io_out = MemoryIO(data), MemoryIO(np.zeros(size, np.uint8))
    K = enc.block_symbols(0)
    # drop 3 source symbols, supply only 1 repair
    esis = list(range(3, K)) + [K]
    payloads = enc.encode_batch(0, np.array(esis), io_in)
    for esi, p in zip(esis, payloads):
        dec.add_symbol(p.tobytes(), make_tag(0, esi), io_out)
    assert dec.num_missing(0) == 3 and dec.num_repair(0) == 1
    assert not dec.repair_block(io_out, 0)
    # feeding the rest repairs it
    more = [K + 1, K + 2, K + 3]
    payloads = enc.encode_batch(0, np.array(more), io_in)
    for esi, p in zip(more, payloads):
        dec.add_symbol(p.tobytes(), make_tag(0, esi), io_out)
    assert dec.repair_block(io_out, 0)


def test_precalculate_and_reset():
    size, T = 4000, 256
    rng = np.random.default_rng(12)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    enc = Encoder(size, T, Al=8)
    assert enc.precalculate()
    io_in = MemoryIO(data)
    p1 = enc.encode_batch(0, np.array([0, 1, enc.block_symbols(0)]), io_in)
    enc.reset(0)
    p2 = enc.encode_batch(0, np.array([0, 1, enc.block_symbols(0)]), io_in)
    assert np.array_equal(p1, p2)


def test_mmap_file_roundtrip_multiblock(tmp_path):
    """BASELINE.json config: multi-block object (Z>1, Al=4) via mmap I/O."""
    from nanorq_tpu.io.ioctx import MmapIO

    rng = np.random.default_rng(21)
    data = rng.integers(0, 256, 60_001, dtype=np.uint8).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    out = tmp_path / "out.bin"

    with MmapIO(str(src)) as io_in:
        enc = Encoder(io_in.size(), 512, Al=4, Z=3)
        assert enc.num_blocks == 3 and enc.scheme.Al == 4
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        with MmapIO(str(out), write=True, create_size=len(data)) as io_out:
            for sbn in range(enc.num_blocks):
                K = enc.block_symbols(sbn)
                esis = np.r_[np.arange(2, K), np.arange(K, K + 5)]  # drop 0,1
                for esi, p in zip(esis, enc.encode_batch(sbn, esis, io_in)):
                    dec.add_symbol(p.tobytes(), make_tag(sbn, int(esi)), io_out)
                assert dec.repair_block(io_out, sbn)
    assert out.read_bytes() == data


def test_k_at_table2_boundaries():
    """K exactly at / adjacent to Table 2 K' values (padding edge cases)."""
    from nanorq_tpu.rfc.params import params_init
    from nanorq_tpu.rfc.tables import K_PADDED

    for kp in (10, 12, 101, 114):
        for K in (kp - 1, kp):
            if K < 1:
                continue
            P = params_init(K)
            assert P.Kp >= K
            _roundtrip(K * 64, 64, 20.0, seed=K, Z=1)
    assert params_init(int(K_PADDED[-1])).Kp == int(K_PADDED[-1])


def test_add_symbols_batched_matches_loop():
    """Vectorized add_symbols must reproduce add_symbol's in-order semantics:
    dups (prior + within-batch), ERR tags, IGN after block completion."""
    size, T = 6000, 256
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    enc = Encoder(size, T, Al=8, Z=1)
    io_in = MemoryIO(data)
    K = enc.block_symbols(0)
    # stream: a few sources, a dup, an ERR tag, repairs, then everything
    # (completing the block), then post-completion stragglers
    esis = list(range(0, K)) + [0, 2, K, K + 1, K + 2, 5, K + 3]
    payloads = enc.encode_batch(0, np.array([min(e, K + 5) for e in esis]), io_in)
    tags = [make_tag(0, e) for e in esis]
    tags[3] = make_tag(99, esis[3])  # bad sbn -> ERR (payload row unused)

    dec_a = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    dec_b = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out_a, out_b = np.zeros(size, np.uint8), np.zeros(size, np.uint8)
    st_loop = [dec_a.add_symbol(payloads[i], tags[i], MemoryIO(out_a)) for i in range(len(tags))]
    st_batch = dec_b.add_symbols(payloads, tags, MemoryIO(out_b))
    assert st_loop == st_batch
    assert np.array_equal(out_a, out_b)
    assert dec_a.num_missing(0) == dec_b.num_missing(0)
    assert dec_a.num_repair(0) == dec_b.num_repair(0)


def test_add_symbols_roundtrip_with_loss():
    """Full decode driven through the batched ingest path only."""
    size, T = 20_000, 256
    rng = np.random.default_rng(12)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    out = np.zeros(size, np.uint8)
    enc = Encoder(size, T, Al=8, Z=2)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    io_in, io_out = MemoryIO(data), MemoryIO(out)
    for sbn in range(enc.num_blocks):
        K = enc.block_symbols(sbn)
        kept = [e for e in range(K) if rng.random() >= 0.1]
        nrep = K - len(kept) + 4
        esis = np.array(kept + list(range(K, K + nrep)))
        payloads = enc.encode_batch(sbn, esis, io_in)
        sts = dec.add_symbols(payloads, [make_tag(sbn, int(e)) for e in esis], io_out)
        assert all(s in (SYM_ADDED, SYM_IGN) for s in sts)
        assert dec.repair_block(io_out, sbn)
    assert np.array_equal(out, data)


def test_memoryio_readonly_bytes():
    from nanorq_tpu.io.ioctx import MemoryIO

    ro = MemoryIO(b"hello world")
    assert not ro.writable
    assert ro.read_at(0, 5) == b"hello"
    with pytest.raises(IOError):
        ro.write_at(0, b"x")
    rw = MemoryIO(bytearray(b"hello"))
    assert rw.writable
    rw.write_at(0, b"J")
    assert rw.read_at(0, 5) == b"Jello"


def test_encoder_t_growth_terminates_and_validates():
    from nanorq_tpu.rfc.tables import MAX_TRANSFER

    # Al=1 used to loop forever (T *= 1); must terminate by doubling
    enc = Encoder(MAX_TRANSFER, 64, Al=1)
    assert enc.symbol_size <= 1 << 16
    assert enc.oti_common() == pack_oti_common(MAX_TRANSFER, enc.symbol_size)
    # growth path that skips past 65536 must raise, not emit a corrupt OTI
    with pytest.raises(ValueError):
        Encoder(MAX_TRANSFER, 48, Al=8)


def test_repair_all_pipelined_matches_per_block():
    """repair_all (thread-pooled solves + overlapped replays) must recover
    exactly what sequential repair_block does, including mixed outcomes."""
    size, T = 30_000, 256
    rng = np.random.default_rng(13)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    enc = Encoder(size, T, Al=8, Z=4)
    io_in = MemoryIO(data)
    out_a, out_b = np.zeros(size, np.uint8), np.zeros(size, np.uint8)
    dec_a = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    dec_b = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    for sbn in range(enc.num_blocks):
        K = enc.block_symbols(sbn)
        kept = [e for e in range(K) if rng.random() >= 0.15]
        nrep = (K - len(kept) + 3) if sbn != 2 else 0  # block 2: unrecoverable
        esis = np.array(kept + list(range(K, K + nrep)))
        payloads = enc.encode_batch(sbn, esis, io_in)
        tags = [make_tag(sbn, int(e)) for e in esis]
        dec_a.add_symbols(payloads, tags, MemoryIO(out_a))
        dec_b.add_symbols(payloads, tags, MemoryIO(out_b))
    ok_a = all([dec_a.repair_block(MemoryIO(out_a), s) for s in range(enc.num_blocks)])
    ok_b = dec_b.repair_all(MemoryIO(out_b))
    assert ok_a == ok_b == False  # noqa: E712 — block 2 lacks repair
    assert np.array_equal(out_a, out_b)
    for s in range(enc.num_blocks):
        assert dec_a.num_missing(s) == dec_b.num_missing(s)
    # recoverable blocks' bytes are correct
    for s in range(enc.num_blocks):
        if dec_b.num_missing(s) == 0:
            for esi in range(enc.block_symbols(s)):
                for off, length, col in symbol_ranges(enc.scheme, s, esi, enc.block_symbols(s)):
                    assert np.array_equal(out_b[off : off + length], data[off : off + length])


def test_add_symbols_fast_path_matches_slow():
    """The whole-batch fast path (clean in-order burst) must be semantically
    identical to the general path: statuses, write-through bytes, block
    state, and a later repair after a partial burst."""
    from nanorq_tpu.codec import api as api_mod

    size, T, Z = 30_000, 256, 3
    rng = np.random.default_rng(21)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    enc = Encoder(size, T, Al=8, Z=Z)
    io_in = MemoryIO(data)

    # full in-order burst over all blocks (fast path taken)
    tags, payloads = [], []
    for sbn in range(enc.num_blocks):
        K = enc.block_symbols(sbn)
        tags += [make_tag(sbn, e) for e in range(K)]
        payloads.append(enc.encode_batch(sbn, np.arange(K), io_in))
    payloads = np.concatenate(payloads)

    def run(disable_fast):
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        if disable_fast:
            dec._add_symbols_fast = lambda *a, **k: None
        out = np.zeros(size, np.uint8)
        sts = dec.add_symbols(payloads, tags, MemoryIO(out))
        return dec, out, sts

    dec_f, out_f, sts_f = run(False)
    dec_s, out_s, sts_s = run(True)
    assert sts_f == sts_s == [SYM_ADDED] * len(tags)
    assert np.array_equal(out_f, out_s)
    for sbn in range(enc.num_blocks):
        assert dec_f.num_missing(sbn) == dec_s.num_missing(sbn) == 0

    # partial burst (fast path stages D rows) followed by repair
    K0 = enc.block_symbols(0)
    keep = np.arange(K0 - 4)
    rep = np.arange(K0, K0 + 6)
    pl = enc.encode_batch(0, np.concatenate([keep, rep]), io_in)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out = np.zeros(size, np.uint8)
    io_out = MemoryIO(out)
    sts = dec.add_symbols(pl[: keep.size], [make_tag(0, int(e)) for e in keep], io_out)
    assert sts == [SYM_ADDED] * keep.size
    b = dec._block(0)
    assert b.nsrc == keep.size and b.D is not None  # rows staged for repair
    dec.add_symbols(pl[keep.size :], [make_tag(0, int(e)) for e in rep], io_out)
    assert dec.repair_block(io_out, 0)
    F0 = K0 * T
    assert np.array_equal(out[:F0], data[:F0])


def test_add_symbol_bad_length_beats_dup():
    """A malformed duplicate-ESI packet is SYM_ERR, not SYM_DUP (the packet
    was never validated, so it was never 'seen')."""
    size, T = 4000, 256
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    enc = Encoder(size, T, Al=8, Z=1)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out = np.zeros(size, np.uint8)
    io_out = MemoryIO(out)
    pl = enc.encode(0, 0, MemoryIO(data))
    assert dec.add_symbol(pl, make_tag(0, 0), io_out) == SYM_ADDED
    assert dec.add_symbol(pl[: T // 2], make_tag(0, 0), io_out) == SYM_ERR
    assert dec.add_symbol(pl, make_tag(0, 0), io_out) == SYM_DUP


def test_mmapio_truncates_growth_on_close(tmp_path):
    """A grown MmapIO must not leave the file larger than the written extent
    (reference writers ftruncate to the object size, lib/io.c:258-300)."""
    import os

    from nanorq_tpu.io.ioctx import MmapIO

    p = str(tmp_path / "grown.bin")
    io_w = MmapIO(p, write=True)
    io_w.write_at(0, b"x" * 1000)
    io_w.write_at(1500, b"y" * 100)  # doubling growth: file becomes 2000
    assert io_w.size() == 2000
    io_w.close()
    assert os.path.getsize(p) == 1600

    # pre-existing bytes beyond the last write are preserved
    io_w = MmapIO(p, write=True)
    io_w.write_at(0, b"z" * 10)
    io_w.close()
    assert os.path.getsize(p) == 1600


def test_mmap_windowed_roundtrip(tmp_path):
    """Sliding-window MmapIO (reference io.c:159-236 behavior): a window far
    smaller than the object still round-trips bit-exact, the mapped VA range
    stays bounded, and growth + truncate-on-close still hold."""
    import mmap as _mmap

    from nanorq_tpu.io.ioctx import MmapIO

    rng = np.random.default_rng(33)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    out = tmp_path / "out.bin"
    win = _mmap.ALLOCATIONGRANULARITY  # one granule (64 KiB/4 KiB): forces remaps

    with MmapIO(str(src), window=win) as io_in:
        enc = Encoder(io_in.size(), 512, Al=4, Z=2)
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        with MmapIO(str(out), write=True, window=win) as io_out:
            for sbn in range(enc.num_blocks):
                K = enc.block_symbols(sbn)
                esis = np.r_[np.arange(3, K), np.arange(K, K + 6)]  # drop 0-2
                for esi, p in zip(esis, enc.encode_batch(sbn, esis, io_in)):
                    dec.add_symbol(p.tobytes(), make_tag(sbn, int(esi)), io_out)
                assert dec.repair_block(io_out, sbn)
            # bounded VA: the live mapping never exceeds window + one slide
            assert io_in._map is None or len(io_in._map) <= 2 * win
    assert out.read_bytes() == data
    # scattered rewrites through a tiny window (remap both directions)
    with MmapIO(str(out), write=True, window=win) as io_w:
        for off in (250_000, 10, 123_456, 299_000, 0):
            io_w.write_at(off, bytes([off % 251]) * 7)
        for off in (250_000, 10, 123_456, 299_000, 0):
            assert io_w.read_at(off, 7) == bytes([off % 251]) * 7
