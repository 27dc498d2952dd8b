"""Steady-state stage profile of the production host repair arm.

Times Decoder._repair_host_batch's phases (Python prep vs the fused native
nrq_host_repair2 call) over fresh patterns with warm per-K' caches; run with
NRQ_TIMING=1 to also get the native per-stage split (solve / s1..s5).
"""
import time, numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from nanorq_tpu.codec import cache as cc
from nanorq_tpu.codec.api import Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.io.ioctx import MemoryIO
from nanorq_tpu.utils import stats

T = 1280
for K, nb in [(1000, 64), (5000, 16), (50000, 8)]:
    rng = np.random.default_rng(7)
    F = K * T * nb
    data = rng.integers(0, 256, F, dtype=np.uint8)
    payloads = data.reshape(nb * K, T)
    enc = Encoder(F, T, Al=8, Z=nb)
    src = MemoryIO(data)
    per_block = []
    for sbn in range(nb):
        gaps = np.nonzero(rng.random(K) < 0.06)[0]
        nrep = gaps.size + max(1, int(0.05 * K))
        rep_esis = np.arange(K, K + nrep)
        per_block.append((gaps, rep_esis, enc.encode_batch(sbn, rep_esis, src)))

    def fresh():
        dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
        out = np.zeros(F, np.uint8)
        io = MemoryIO(out)
        for sbn, (gaps, rep_esis, rep_pl) in enumerate(per_block):
            keep = np.setdiff1d(np.arange(K), gaps)
            dec.add_symbols(payloads[sbn * K + keep],
                            [make_tag(sbn, int(e)) for e in keep], io)
            dec.add_symbols(rep_pl, [make_tag(sbn, int(e)) for e in rep_esis], io)
        return dec, out, io

    best, best_native = float("inf"), float("inf")
    for it in range(4):
        dec, out, io = fresh()
        cc.clear_decoder_cache()
        stats.reset()
        t0 = time.perf_counter()
        work = []
        for sbn in range(nb):
            prep = dec._repair_prepare(sbn)
            assert not isinstance(prep, bool)
            work.append((sbn,) + prep)
        t_prep = time.perf_counter() - t0
        t0 = time.perf_counter()
        ok, _ = dec._repair_host_batch(work, io)
        t_batch = time.perf_counter() - t0
        assert ok and np.array_equal(out, data)
        t_native = stats.snapshot().get("timers", {}).get("host_repair", t_batch)
        if isinstance(t_native, dict):
            t_native = t_native.get("total_s", t_batch)
        tot = t_prep + t_batch
        if tot < best:
            best, parts = tot, (t_prep, t_batch, t_native)
    t_prep, t_batch, t_native = parts
    print(f"K={K} nb={nb}: total {1e3*best:.1f} ms = prep {1e3*t_prep:.1f} + "
          f"batch {1e3*t_batch:.1f} (native {1e3*float(t_native):.1f}, "
          f"py-build {1e3*(t_batch-float(t_native)):.1f})"
          f"  -> {8*F/best/1e9:.2f} Gbps  ({1e3*best/nb:.2f} ms/block)")
