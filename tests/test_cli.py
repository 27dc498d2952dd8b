"""File round-trip through the CLI encoder/decoder (reference `make test`
analog, example.make:1-14: encode a text file with simulated loss, decode,
byte-compare)."""

import os

import numpy as np

from nanorq_tpu.cli.decode import main as decode_main
from nanorq_tpu.cli.encode import main as encode_main


def test_cli_file_roundtrip(tmp_path):
    rng = np.random.default_rng(42)
    src = tmp_path / "input.bin"
    # mixed compressible + random content, non-multiple of packet size
    data = bytes(rng.integers(0, 256, 30_001, dtype=np.uint8)) + b"war and peace " * 500
    src.write_bytes(data)
    rq = tmp_path / "data.rq"
    out = tmp_path / "output.bin"
    cwd = os.getcwd()
    rc = encode_main([str(src), "1280", "-o", str(rq), "--seed", "7"])
    assert rc == 0
    rc = decode_main([str(out), "-i", str(rq)])
    assert rc == 0
    assert out.read_bytes() == data


def test_cli_layout_cache_persists(tmp_path, monkeypatch):
    """--layout-cache round trip: the first decode saves the per-K' frozen
    layouts, a second decode loads them (checkpoint/resume of the decoder's
    compiled-program reuse state).  Forces the structured plan path — the
    dense-W path has no layouts to persist."""
    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.precode import device_schedule as dsm

    monkeypatch.setattr(cc, "WPATH_MAX_KP", 0)
    monkeypatch.setattr(cc, "WPATH_GF256_MAX_KP", 0)
    dsm.clear_layout_cache()
    rng = np.random.default_rng(3)
    src = tmp_path / "input.bin"
    src.write_bytes(bytes(rng.integers(0, 256, 120_000, dtype=np.uint8)))
    rq = tmp_path / "data.rq"
    lay = tmp_path / "layouts"
    assert encode_main([str(src), "256", "-o", str(rq), "--seed", "5"]) == 0
    for run in range(2):
        out = tmp_path / f"out{run}.bin"
        if run:  # a cold process would load the saved layouts; simulate it
            dsm.clear_layout_cache()
        assert decode_main([str(out), "-i", str(rq), "--layout-cache", str(lay)]) == 0
        assert out.read_bytes() == src.read_bytes()
        assert (lay / "decode_layouts.bin").exists()
    with dsm._layout_lock:
        assert dsm._layout_cache, "second run should have loaded persisted layouts"


def test_cli_schedule_cache_persists(tmp_path):
    """--schedule-cache: first encode writes the per-K' schedule checkpoint;
    a cold second process loads it instead of re-solving."""
    from nanorq_tpu.codec import cache as cc

    rng = np.random.default_rng(11)
    src = tmp_path / "input.bin"
    src.write_bytes(bytes(rng.integers(0, 256, 64_000, dtype=np.uint8)))
    sched = tmp_path / "sched"
    for run in range(2):
        rq = tmp_path / f"data{run}.rq"
        if run:  # simulate a cold process: drop the in-memory entry
            with cc._enc_lock:
                cc._enc_cache.clear()
        assert encode_main(
            [str(src), "512", "-o", str(rq), "--seed", "2", "--schedule-cache", str(sched)]
        ) == 0
        assert any(p.suffix == ".sched" for p in sched.iterdir())
        out = tmp_path / f"out{run}.bin"
        assert decode_main([str(out), "-i", str(rq)]) == 0
        assert out.read_bytes() == src.read_bytes()


def test_cli_wire_format(tmp_path):
    """data.rq layout: u64 LE oti_common, u32 LE oti_scheme, (u32 tag, T)*"""
    import struct

    src = tmp_path / "in.bin"
    src.write_bytes(bytes(range(256)) * 20)
    rq = tmp_path / "data.rq"
    assert encode_main([str(src), "256", "-o", str(rq), "--seed", "1", "--loss", "0"]) == 0
    blob = rq.read_bytes()
    common, scheme = struct.unpack_from("<QI", blob, 0)
    F, T = common >> 24, (common & 0xFFFF) + 1
    assert F == 256 * 20 and T == 256
    Al = scheme & 0xFF
    assert Al == 8
    body = blob[12:]
    assert len(body) % (4 + T) == 0
    tags = [struct.unpack_from("<I", body, i * (4 + T))[0] for i in range(len(body) // (4 + T))]
    sbns = {t >> 24 for t in tags}
    assert sbns == set(range(((scheme >> 24) & 0xFF) + 1))


def test_cli_mesh_auto_roundtrip(tmp_path):
    """--mesh auto on both CLIs: encode + decode sharded over the 8-device
    virtual mesh, byte-exact file round trip (the production multi-chip
    CLI path)."""
    rng = np.random.default_rng(11)
    src = tmp_path / "input.bin"
    data = bytes(rng.integers(0, 256, 50_000, dtype=np.uint8))
    src.write_bytes(data)
    rq = tmp_path / "data.rq"
    out = tmp_path / "output.bin"
    rc = encode_main([str(src), "512", "-o", str(rq), "--seed", "5", "--mesh", "auto"])
    assert rc == 0
    rc = decode_main([str(out), "-i", str(rq), "--mesh", "auto"])
    assert rc == 0
    assert out.read_bytes() == data
