import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import os, sys, time, numpy as np
os.environ.setdefault("NRQ_TIMING", "1")
from nanorq_tpu.codec import cache as cc
from nanorq_tpu.codec.api import Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.io.ioctx import MemoryIO

T = 1280
Ks = [int(a) for a in sys.argv[1:]] or [1000]
NB = {100: 128, 500: 64, 1000: 64, 5000: 16, 10000: 8, 50000: 4}
for K in Ks:
    nb = NB[K]
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
            dec.add_symbols(payloads[sbn * K + keep], [make_tag(sbn, int(e)) for e in keep], io)
            dec.add_symbols(rep_pl, [make_tag(sbn, int(e)) for e in rep_esis], io)
        return dec, out, io
    best = float("inf")
    for it in range(3):
        dec, out, io = fresh()
        cc.clear_decoder_cache()
        t0 = time.time()
        ok = dec.repair_all(io, backend="host")
        dt = time.time() - t0
        assert ok and np.array_equal(out, data)
        best = min(best, dt)
        print(f"  iter {it}: {1e3*dt:.1f} ms", file=sys.stderr)
    print(f"K={K} nb={nb}: host e2e {8*F/best/1e9:.2f} Gbps  ({1e3*best:.1f} ms for {F>>20} MiB, {1e3*best/nb:.2f} ms/blk)")
