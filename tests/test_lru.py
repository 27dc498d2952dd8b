"""Byte-budgeted plan caches (VERDICT r3 weak #3): eviction under a small
budget, None-entry handling, and end-to-end budget enforcement through
codec.cache.decoder_plan."""

import numpy as np
import pytest

from nanorq_tpu.utils.lru import ByteLRU, deep_nbytes


def test_deep_nbytes_counts_arrays():
    a = np.zeros((100, 10), np.uint8)
    assert deep_nbytes(a) == 1000
    assert deep_nbytes((a, [a, None], {"x": a})) == 3000

    class Slotted:
        __slots__ = ("x", "y")

        def __init__(self):
            self.x = np.zeros(64, np.uint8)
            self.y = None

    assert deep_nbytes(Slotted()) == 64


def test_byte_lru_evicts_oldest():
    lru = ByteLRU(1000, "t")
    big = np.zeros(400, np.uint8)
    lru.put(b"a", big)
    lru.put(b"b", big)
    assert lru.get(b"a") == (True, big) and len(lru) == 2
    lru.put(b"c", big)  # 1200 bytes > budget: evicts b (a was touched)
    assert len(lru) == 2
    assert lru.get(b"b")[0] is False
    assert lru.get(b"a")[0] is True and lru.get(b"c")[0] is True


def test_byte_lru_none_and_oversize():
    lru = ByteLRU(100, "t")
    lru.put(b"fail", None)  # rank-deficient outcomes cache as None
    hit, v = lru.get(b"fail")
    assert hit and v is None
    # a single over-budget entry is still retained (never evict to empty)
    lru.put(b"huge", np.zeros(10_000, np.uint8))
    assert lru.get(b"huge")[0] is True and len(lru) == 1


def test_decoder_plan_cache_respects_budget(monkeypatch):
    from nanorq_tpu.codec import cache as cc
    from nanorq_tpu.rfc.params import params_init
    from nanorq_tpu.utils import stats

    P = params_init(100)
    monkeypatch.setattr(cc, "_dec_cache", ByteLRU(6_000, "dec_cache"))
    ev0 = stats.snapshot()["counters"].get("dec_cache_evict", 0)
    rng = np.random.default_rng(3)
    for s in range(6):
        gaps = np.nonzero(rng.random(100) < 0.1)[0]
        ov = 5
        isis = np.arange(P.Kp + ov, dtype=np.uint32)
        rep = (np.arange(100, 100 + gaps.size + ov) + (P.Kp - 100)).astype(np.uint32)
        isis[gaps] = rep[: gaps.size]
        isis[P.Kp :] = rep[gaps.size :]
        assert cc.decoder_plan(P, isis, ov) is not None
    assert cc._dec_cache.bytes <= 6_000
    assert stats.snapshot()["counters"].get("dec_cache_evict", 0) > ev0
