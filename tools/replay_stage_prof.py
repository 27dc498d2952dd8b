"""Per-stage timing of the structured replay at a given K/B.

Times, with the bench's chained-iteration methodology:
  full        the complete 6-stage replay
  tri_gather  only the per-chunk staircase-range gathers (scan, no matmul)
  tri_matmul  only the per-chunk GF(2) chunk-inverse matmuls
  tri_ov      only the per-chunk overflow gathers + width-1 selects
  tri         one full trisolve
  mid         stages 2-4 (bsel/HDPC/Vinv/ut)
  lt          LT combine of all K' symbols

Usage: python tools/replay_stage_prof.py [K] [B] [iters]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nanorq_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from nanorq_tpu.codec.cache import encoder_schedule
from nanorq_tpu.ops.lt import lt_combine, lt_plan
from nanorq_tpu.ops.replay import (
    _apply_plan,
    _gather,
    _gf2mm,
    _replay_jit,
    _select_rows,
    _trisolve,
    _unpack_bits,
    device_arrays,
    take_rows,
)
from nanorq_tpu.rfc.params import params_init

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
T = 1280
t = B * T

P = params_init(K)
ds = encoder_schedule(P.Kp, CB=int(os.environ["NANORQ_CB"]) if "NANORQ_CB" in os.environ else None)
arr = device_arrays(ds)
a = dict(arr)
pallas = a.pop("pallas")
Lpad = ds.Lpad
CB = ds.CB

rng = np.random.default_rng(0)
D = np.zeros((ds.M_pad, t), np.uint8)
D[:K] = rng.integers(0, 256, (K, t), dtype=np.uint8)
Dj = jnp.asarray(D)
payload = K * T * B

nseg = len(ds.tri)
shapes = [[(a, b, ix.shape[2]) for a, b, ix in seg.ranges] for seg in ds.tri]
ndeps = sum(int((ix < Lpad).sum()) for seg in ds.tri for _, _, ix in seg.ranges)
nslots = sum(ix.size for seg in ds.tri for _, _, ix in seg.ranges)
print(
    f"K={K} Kp={P.Kp} L={P.L} Lpad={Lpad} CB={CB} chunks={Lpad//CB} segs={nseg} "
    f"range fill {ndeps}/{nslots} ({100*ndeps/max(1,nslots):.0f}%) ranges={shapes}"
)


def timed(name, fn, x0, n=iters):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n, fn, x)

    def sync(o):
        leaf = jax.tree.leaves(o)[0]
        _ = np.asarray(leaf[0, :4] if leaf.ndim == 2 else leaf.ravel()[:4])

    t0 = time.time()
    xc = run(x0)
    sync(xc)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(2):  # chained: no two relay calls identical (cache pitfall)
        t0 = time.time()
        xc = run(xc)
        sync(xc)
        best = min(best, time.time() - t0 - 0.035)
    per = max(1e-9, best / n)
    print(f"  {name:12s} {1e3*per:8.2f} ms  ({8*payload/per/1e9:6.2f} Gbps eq)  [compile {compile_s:.1f}s]")
    return per


# --- full replay ---
timed("full", lambda i, Dc: Dc.at[: P.L].set(_replay_jit(a, Dc, pallas)), Dj)

# --- one trisolve ---
y0 = take_rows(pallas, Dj, a["piv_rows"])


def tri_body(i, y):
    z = _trisolve(a, y, pallas)
    return y.at[:Lpad].set(z[:Lpad])


timed("tri(x1)", tri_body, y0)

# --- range gathers only (same scan structure, skip matmul) ---
def tri_gather_only(i, y):
    zext = jnp.concatenate([y, jnp.zeros((1, t), jnp.uint8)], axis=0)
    out = y
    for seg in a["tri"]:
        if not seg["ridx"]:
            continue

        def body(carry, ridx_q):
            acc = carry
            for ix in ridx_q:
                g = _gather(pallas, zext, ix)
                acc = acc ^ g[:1]
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.zeros((1, t), jnp.uint8), seg["ridx"])
        out = out.at[:1].set(out[:1] ^ acc)
    return out


timed("tri_gather", tri_gather_only, y0)

# --- chunk matmuls only ---
def tri_matmul_only(i, y):
    out = y
    for seg in a["tri"]:
        tinv = _unpack_bits(seg["tinv"])

        def body(carry, tinv_q):
            r = _gf2mm(pallas, tinv_q, carry)
            return r, None

        r, _ = jax.lax.scan(body, y[:CB], tinv)
        out = out.at[:CB].set(r)
    return out


timed("tri_matmul", tri_matmul_only, y0)

# --- stages 2-4 ---
def mid_body(i, y):
    z = jnp.concatenate([y, jnp.zeros((1, t), jnp.uint8)], axis=0)
    u_pad = a["vinv_bits"].shape[0] // 8
    zsel = _apply_plan(pallas, z, a["bsel"], take_rows(pallas, Dj, a["sel_rows"]))
    if a["mhd_bits"] is not None:
        from nanorq_tpu.ops.replay import _gf256mm, VINV_KB

        hvals = _gf256mm(pallas, _unpack_bits(a["mhd_bits"]), z[:Lpad], CB)
        zsel = zsel ^ _select_rows(pallas, hvals, a["hd_sel"])
    from nanorq_tpu.ops.replay import _gf256mm, VINV_KB

    xu = _gf256mm(pallas, _unpack_bits(a["vinv_bits"]), zsel, min(u_pad, VINV_KB))
    from nanorq_tpu.ops.replay import _gf2mm_wide

    xa = z[:Lpad] ^ _gf2mm_wide(pallas, _unpack_bits(a["wut_bits"]), xu)
    return y.at[:Lpad].set(xa)


timed("mid(2-4)", mid_body, y0)

# --- mid sub-stages ---
from nanorq_tpu.ops.replay import VINV_KB, _gf256mm

if a["mhd_bits"] is not None:
    def hdpc_body(i, y):
        hv = _gf256mm(pallas, _unpack_bits(a["mhd_bits"]), y[:Lpad], CB)
        return y.at[: hv.shape[0]].set(hv)

    timed("mid:hdpc_mm", hdpc_body, y0)


def vinv_body(i, y):
    u_pad = a["vinv_bits"].shape[0] // 8
    xu = _gf256mm(pallas, _unpack_bits(a["vinv_bits"]), y[:u_pad], min(u_pad, VINV_KB))
    return y.at[:u_pad].set(xu)


timed("mid:vinv_mm", vinv_body, y0)


def wut_body(i, y):
    from nanorq_tpu.ops.replay import _gf2mm_wide

    u_pad = a["vinv_bits"].shape[0] // 8
    xa = y[:Lpad] ^ _gf2mm_wide(pallas, _unpack_bits(a["wut_bits"]), y[:u_pad])
    return y.at[:Lpad].set(xa)


timed("mid:wut_mm", wut_body, y0)


def bsel_body(i, y):
    u_pad = a["vinv_bits"].shape[0] // 8
    zs = _apply_plan(pallas, y, a["bsel"], y[:u_pad])
    return y.at[:u_pad].set(zs)


timed("mid:bsel", bsel_body, y0)


def takerows_body(i, D):
    r = take_rows(pallas, D, a["piv_rows"])  # piv_rows indexes D's M_pad rows
    return D.at[:Lpad].set(r)


timed("mid:take_rows", takerows_body, Dj)

# --- LT combine of all Kp ---
plan_all = lt_plan(np.arange(P.Kp, dtype=np.uint32), P)
C0 = _replay_jit(a, Dj, pallas)


def lt_body(i, C):
    s = lt_combine(C, plan_all)
    m = min(s.shape[0], P.L)
    return C.at[:m].set(s[:m])


timed("lt(all Kp)", lt_body, C0)
