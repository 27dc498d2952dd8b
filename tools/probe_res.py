import time, numpy as np
from nanorq_tpu.codec import cache as cc
from nanorq_tpu.codec.api import Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.io.ioctx import MemoryIO
from nanorq_tpu.utils import stats

K, T, nblocks = 1000, 1280, 32
rng = np.random.default_rng(7)
F = K * T * nblocks
data = rng.integers(0, 256, F, dtype=np.uint8)
payloads = data.reshape(nblocks * K, T)
enc = Encoder(F, T, Al=8, Z=nblocks)
src = MemoryIO(data)
per_block = []
for sbn in range(nblocks):
    gaps = np.nonzero(rng.random(K) < 0.06)[0]
    nrep = gaps.size + max(1, int(0.05 * K))
    rep_esis = np.arange(K, K + nrep)
    keep = np.setdiff1d(np.arange(K), gaps)
    per_block.append((keep, rep_esis, enc.encode_batch(sbn, rep_esis, src)))
out = np.zeros(F, np.uint8)

def fresh_decoder():
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out[:] = 0
    io = MemoryIO(out)
    for sbn, (keep, rep_esis, rep_pl) in enumerate(per_block):
        dec.add_symbols(payloads[sbn * K + keep], [make_tag(sbn, int(e)) for e in keep], io)
        dec.add_symbols(rep_pl, [make_tag(sbn, int(e)) for e in rep_esis], io)
    return dec, io

for it in range(3):
    dec, io = fresh_decoder()
    cc.clear_decoder_cache()
    s0 = {k: v for k, v in stats.snapshot()["timers"].items()}
    t0 = time.time()
    ok = dec.repair_all(io, backend="res")
    dt = time.time() - t0
    assert ok and np.array_equal(out, data)
    s1 = stats.snapshot()["timers"]
    delta = {k: round(s1[k]["total_s"] - s0.get(k, {"total_s": 0})["total_s"], 4)
             for k in s1 if s1[k]["total_s"] - s0.get(k, {"total_s": 0})["total_s"] > 1e-4}
    print(f"iter {it}: total {dt*1e3:.1f} ms, Gbps {8*F/dt/1e9:.2f}, timers {delta}")
