"""Profile the host decode arm at small K: where does per-block time go?"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import cProfile
import pstats
import time

import numpy as np

from nanorq_tpu.codec import cache as cc
from nanorq_tpu.codec.api import Decoder, Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.io.ioctx import MemoryIO

K = int(os.environ.get("PK", "100"))
nb = int(os.environ.get("PNB", "128"))
T = 1280
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


# warm
dec, out, io = fresh()
cc.clear_decoder_cache()
assert dec.repair_all(io, backend="host") and np.array_equal(out, data)

best = float("inf")
for _ in range(3):
    dec, out, io = fresh()
    cc.clear_decoder_cache()
    t0 = time.time()
    ok = dec.repair_all(io, backend="host")
    dt = time.time() - t0
    assert ok and np.array_equal(out, data)
    best = min(best, dt)
print(f"K={K} nb={nb}: host e2e {8*F/best/1e9:.2f} Gbps ({1e3*best:.1f} ms, {1e3*best/nb:.3f} ms/blk)")

dec, out, io = fresh()
cc.clear_decoder_cache()
pr = cProfile.Profile()
pr.enable()
dec.repair_all(io, backend="host")
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
