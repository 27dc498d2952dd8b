#!/usr/bin/env python3
"""ASan driver for the native runtime — JAX-FREE by construction.

Loading libasan via LD_PRELOAD into a process that later initializes
jaxlib/XLA aborts inside the XLA compiler (allocator interception clash),
so `make ubsan-native` runs the full pytest suites under UBSan only, and
THIS driver covers the AddressSanitizer half: it exercises every native
raw-pointer path the advisor flagged (nrq_solve GE + schedule export,
host_repair_shared / host_residual write-through via _row_ptrs /
_out_row_ptrs, codec/api.py:704-744) using only NumPy for payload math
(precode.schedule.replay_numpy + rfc.tuples.lt_indices), never importing
jax.

Run (make asan-native):
  NANORQ_NATIVE_SANITIZE=address,undefined \
  LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
  ASAN_OPTIONS=detect_leaks=0 python tools/asan_drive.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(cond, msg):
    if not cond:
        print(f"FAIL: {msg}")
        sys.exit(1)


def no_xla_client():
    """True while no XLA backend has been initialized.  sitecustomize
    pre-imports jax in this image, so `jax in sys.modules` proves nothing;
    what aborts under preloaded ASan is creating/compiling on an XLA
    client, and this asserts the driver never did."""
    xb = sys.modules.get("jax._src.xla_bridge")
    return not (xb is not None and getattr(xb, "_backends", None))


def drive(K, T, Z, loss, seed, backend):
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO
    from nanorq_tpu.precode.solver import solve_encoder
    from nanorq_tpu.precode.schedule import replay_numpy
    from nanorq_tpu.rfc.params import params_init
    from nanorq_tpu.rfc.tuples import lt_indices

    rng = np.random.default_rng(seed)
    F = K * T * Z
    data = rng.integers(0, 256, F, dtype=np.uint8)
    enc = Encoder(F, T, Al=1, Z=Z)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out = np.zeros(F, np.uint8)
    io = MemoryIO(out)

    for sbn in range(dec.num_blocks):
        Kb = dec.block_symbols(sbn)
        src = data[sbn * K * T : (sbn + 1) * K * T].reshape(Kb, T)
        P = params_init(Kb)
        # jax-free encode: host op-tape replay of the encoder schedule
        S = solve_encoder(P)
        check(S is not None, f"encoder solve failed K={Kb}")
        D = np.zeros((S.n_rows, T), np.uint8)
        D[:Kb] = src
        C = replay_numpy(D, S)
        gaps = np.nonzero(rng.random(Kb) < loss)[0]
        nrep = gaps.size + 3
        rep_isis = (np.arange(Kb, Kb + nrep) + (P.Kp - Kb)).astype(np.uint32)
        idx, valid = lt_indices(rep_isis, P)
        rep = np.zeros((nrep, T), np.uint8)
        for r in range(nrep):
            for c in idx[r][valid[r]]:
                rep[r] ^= C[c]
        keep = np.setdiff1d(np.arange(Kb), gaps)
        dec.add_symbols(src[keep], [make_tag(sbn, int(e)) for e in keep], io)
        dec.add_symbols(rep, [make_tag(sbn, int(e)) for e in range(Kb, Kb + nrep)], io)

    check(dec.repair_all(io, backend=backend), f"repair_all({backend}) failed")
    check(np.array_equal(out, data), f"round-trip bytes mismatch ({backend})")
    print(f"OK K={K} Z={Z} loss={loss} backend={backend}")


def main():
    check(no_xla_client(), "an XLA client exists before the driver ran")
    from nanorq_tpu.native import native_available

    check(native_available(), "native library unavailable (build failed?)")
    # host arm: patched native solve + fused substitution, write-through
    drive(K=100, T=64, Z=3, loss=0.08, seed=1, backend="host")
    drive(K=500, T=96, Z=2, loss=0.06, seed=2, backend="host")
    drive(K=1000, T=128, Z=1, loss=0.06, seed=3, backend="host")
    # residual-host arm: canonical factorization + native G-inverse (small K')
    drive(K=100, T=64, Z=3, loss=0.08, seed=4, backend="res_host")
    drive(K=200, T=48, Z=2, loss=0.10, seed=5, backend="res_host")
    check(no_xla_client(), "a codec path initialized an XLA client — ASan cover broken")
    print("asan_drive: all native-arm round trips bit-exact, no XLA client touched")


if __name__ == "__main__":
    main()
