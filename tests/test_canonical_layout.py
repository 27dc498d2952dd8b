"""Canonical (frozen) decode layouts: one compiled program per K'.

Decode schedules are compiled against a per-K' frozen layout
(precode/device_schedule.py): after a short warm-up, every loss pattern's
schedule has IDENTICAL tensor shapes and static bounds, so the jitted
replay executes without recompiling per pattern (ADVICE r2 #5; the
reference's analog is that its op-tape replay is shape-free,
lib/precode.c:23-32).  These tests pin the convergence contract and the
bit-exactness of frozen-layout (heavy-reordered, spill-range) schedules.
"""

import numpy as np
import pytest

from nanorq_tpu.codec import cache as cc
from nanorq_tpu.precode import device_schedule as dsm
from nanorq_tpu.precode.solver import solve_state
from nanorq_tpu.rfc.params import params_init


def _pattern(P, K, ov, seed):
    rng = np.random.default_rng(seed)
    gaps = np.nonzero(rng.random(K) < 0.06)[0]
    isis = np.arange(P.Kp + ov, dtype=np.uint32)
    rep = (np.arange(K, K + gaps.size + ov) + (P.Kp - K)).astype(np.uint32)
    isis[gaps] = rep[: gaps.size]
    isis[P.Kp :] = rep[gaps.size :]
    return gaps, isis


def _sig(ds):
    return (
        tuple(
            (seg.tinv.shape, tuple((a, b) for a, b, _ in seg.ranges),
             tuple(ix.shape for _, _, ix in seg.ranges))
            for seg in ds.tri
        ),
        ds.wut.shape,
        None if ds.mhd is None else ds.mhd.shape,
        ds.vinv.shape, ds.out_sel.shape, ds.piv_rows.shape,
        tuple(p.shape for p in ds.bsel.passes),
        tuple((ix.shape, oh.shape) for ix, oh in ds.bsel.overflow),
    )


@pytest.fixture(autouse=True)
def _fresh_layout_cache():
    dsm.clear_layout_cache()
    yield
    dsm.clear_layout_cache()


def test_patterns_share_one_program_after_warmup():
    K = 1800
    P = params_init(K)
    ov = max(1, int(0.05 * K))
    N = 14
    sigs = []
    for s in range(N):
        _, isis = _pattern(P, K, ov, 400 + s)
        st = solve_state(P, cc._patched_rows(P, isis, ov), ov)
        assert st is not None
        sigs.append(_sig(dsm.compile_device(st, canonical=True)))
    # the frozen envelope grows monotonically on the rare pattern that pokes
    # above it; the contract is CONVERGENCE, not zero growth: the last
    # patterns share one program and the total distinct programs stay far
    # below one-per-pattern (at this K: warm-up 2 + freeze + ~2 growths)
    assert sigs[-1] == sigs[-2] == sigs[-3], "did not converge to a shared program"
    assert len(set(sigs)) <= dsm._FREEZE_AFTER + 4, f"{len(set(sigs))} programs for {N} patterns"


def test_frozen_layout_replay_bit_exact():
    K = 1800
    P = params_init(K)
    ov = max(1, int(0.05 * K))
    rng = np.random.default_rng(9)
    for s in range(dsm._FREEZE_AFTER + 2):
        _, isis = _pattern(P, K, ov, 500 + s)
        st = solve_state(P, cc._patched_rows(P, isis, ov), ov)
        ds_c = dsm.compile_device(st, canonical=True)
        ds_d = dsm.compile_device(st, canonical=False)
        D = np.zeros((ds_c.M_pad, 64), np.uint8)
        D[:K] = rng.integers(0, 256, (K, 64), dtype=np.uint8)
        Dd = np.zeros((ds_d.M_pad, 64), np.uint8)
        Dd[:K] = D[:K]
        C1 = dsm.replay_structured_numpy(D, ds_c)
        C2 = dsm.replay_structured_numpy(Dd, ds_d)
        assert np.array_equal(C1, C2), f"pattern {s}: canonical replay diverged"


def test_canonical_compile_at_nondividing_cb():
    """The heavy-zone pad must round up to whole chunks: a CB that does not
    divide the quantized pad (e.g. 1024 when hp would be 512) previously
    broke the Lpad % CB == 0 invariant and crashed the warm-up reshape."""
    K = 1800
    P = params_init(K)
    ov = max(1, int(0.05 * K))
    rng = np.random.default_rng(31)
    for CB in (1024, 640):
        dsm.clear_layout_cache()
        _, isis = _pattern(P, K, ov, 7000)
        st = solve_state(P, cc._patched_rows(P, isis, ov), ov)
        ds_c = dsm.compile_device(st, CB=CB, canonical=True)
        assert ds_c.Lpad % CB == 0
        ds_d = dsm.compile_device(st, CB=CB, canonical=False)
        D = np.zeros((ds_c.M_pad, 64), np.uint8)
        D[:K] = rng.integers(0, 256, (K, 64), dtype=np.uint8)
        Dd = np.zeros((ds_d.M_pad, 64), np.uint8)
        Dd[:K] = D[:K]
        assert np.array_equal(
            dsm.replay_structured_numpy(D, ds_c), dsm.replay_structured_numpy(Dd, ds_d)
        ), f"CB={CB}: canonical replay diverged"


def test_heavy_zone_order_is_topological():
    """The greedy zone order must keep every closed-subgraph dep backward."""
    K = 5000
    P = params_init(K)
    ov = max(1, int(0.05 * K))
    _, isis = _pattern(P, K, ov, 123)
    st = solve_state(P, cc._patched_rows(P, isis, ov), ov)
    dep_k, dep_pos = st.tri_edges
    heavy, rank = dsm._heavy_zone_order(st.i, dep_k, dep_pos)
    hh = heavy[dep_k] & heavy[dep_pos]
    assert (rank[dep_k[hh]] > rank[dep_pos[hh]]).all()
    # closure is closed: light rows never depend on closed rows
    light_on_closed = ~heavy[dep_k] & heavy[dep_pos]
    assert not light_on_closed.any()


def test_layout_cache_save_load_roundtrip(tmp_path):
    """A restarted decoder that loads persisted layouts compiles the SAME
    program shapes for new patterns — no warm-up, no re-freeze."""
    K = 1800
    P = params_init(K)
    ov = max(1, int(0.05 * K))
    sigs = []
    for s in range(dsm._FREEZE_AFTER + 3):
        _, isis = _pattern(P, K, ov, 700 + s)
        st = solve_state(P, cc._patched_rows(P, isis, ov), ov)
        sigs.append(_sig(dsm.compile_device(st, canonical=True)))
    path = str(tmp_path / "layouts.bin")
    dsm.save_layout_cache(path)
    dsm.clear_layout_cache()
    assert dsm.load_layout_cache(path) >= 1
    _, isis = _pattern(P, K, ov, 999)
    st = solve_state(P, cc._patched_rows(P, isis, ov), ov)
    sig = _sig(dsm.compile_device(st, canonical=True))
    assert sig == sigs[-1], "restored layout produced different program shapes"


def test_end_to_end_repair_with_canonical_layouts():
    """Full API round trip at a K that exercises the structured canonical
    path (W path disabled), multiple distinct loss patterns."""
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO

    old = cc.WPATH_MAX_KP
    cc.WPATH_MAX_KP = 0  # force the structured canonical decode path
    try:
        K, T, B = 1100, 48, dsm._FREEZE_AFTER + 2
        rng = np.random.default_rng(3)
        data = rng.integers(0, 256, K * T * B, dtype=np.uint8)
        enc = Encoder(data.size, T, Al=1, Z=B)
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        out = np.zeros_like(data)
        io_in, io_out = MemoryIO(data), MemoryIO(out)
        for sbn in range(B):
            Kb = enc.block_symbols(sbn)
            gaps = np.nonzero(rng.random(Kb) < 0.06)[0]
            keep = np.setdiff1d(np.arange(Kb), gaps)
            nrep = gaps.size + max(1, Kb // 20)
            esis = np.concatenate([keep, np.arange(Kb, Kb + nrep)])
            pl = enc.encode_batch(sbn, esis, io_in)
            for e, p in zip(esis, pl):
                dec.add_symbol(p.tobytes(), make_tag(sbn, int(e)), io_out)
            assert dec.repair_block(io_out, sbn)
        assert np.array_equal(out, data)
    finally:
        cc.WPATH_MAX_KP = old
