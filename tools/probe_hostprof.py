import time, numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from nanorq_tpu.codec import cache as cc
from nanorq_tpu.codec.api import Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.io.ioctx import MemoryIO
from nanorq_tpu.native import host_repair

T = 1280
for K, nb in [(1000, 64), (50000, 8)]:
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
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out = np.zeros(F, np.uint8); io = MemoryIO(out)
    for sbn, (gaps, rep_esis, rep_pl) in enumerate(per_block):
        keep = np.setdiff1d(np.arange(K), gaps)
        dec.add_symbols(payloads[sbn * K + keep], [make_tag(sbn, int(e)) for e in keep], io)
        dec.add_symbols(rep_pl, [make_tag(sbn, int(e)) for e in rep_esis], io)
    cc.clear_decoder_cache()
    # phase-timed version of _repair_host_batch
    P = dec.P
    t0 = time.perf_counter()
    work = []
    for sbn in range(nb):
        prep = dec._repair_prepare(sbn)
        assert not isinstance(prep, bool)
        work.append((sbn,) + prep)
    t_prep = time.perf_counter() - t0
    base = cc._base_rows(P)
    t0 = time.perf_counter()
    items, metas = [], []
    t_rows = t_gap = t_D = 0.0
    for sbn, gaps, isis, ov in work:
        ta = time.perf_counter()
        rows = cc._patched_rows(P, isis, ov)
        tb = time.perf_counter(); t_rows += tb - ta
        gap_csr = cc._rows_subset(base, gaps)
        tc = time.perf_counter(); t_gap += tc - tb
        D = dec._repair_D(sbn, gaps, ov, len(rows))
        t_D += time.perf_counter() - tc
        items.append((rows, D, gap_csr)); metas.append((sbn, gaps))
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = host_repair(P, items, T)
    t_native = time.perf_counter() - t0
    outs, statuses = res
    assert all(s == 0 for s in statuses)
    t0 = time.perf_counter()
    for (sbn, gaps), o in zip(metas, outs):
        dec._repair_finish(io, sbn, gaps, o)
    t_finish = time.perf_counter() - t0
    assert np.array_equal(out, data)
    tot = t_prep + t_build + t_native + t_finish
    print(f"K={K} nb={nb}: total {1e3*tot:.1f} ms = prep {1e3*t_prep:.1f} + build {1e3*t_build:.1f} "
          f"(rows {1e3*t_rows:.1f}, gapcsr {1e3*t_gap:.1f}, D {1e3*t_D:.1f}) + native {1e3*t_native:.1f} + finish {1e3*t_finish:.1f}"
          f"  -> {8*F/tot/1e9:.2f} Gbps")
    # native-only rate and per-block solve cost
    import os
    os.environ["NRQ_TIMING"] = "1"
