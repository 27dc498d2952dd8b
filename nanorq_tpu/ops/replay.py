"""Device executor for the structured precode replay program.

Runs the 6-stage program from precode.device_schedule on a payload matrix
D [M_pad, t] (uint8, rows beyond the logical system zeroed), producing the
intermediate symbols C [L, t].  The payload axis t is the batching axis: the
codec lays out B independent blocks side by side (t = B*T), so every stage
is a wide VPU/MXU op and the ~2*Lpad/CB-step sequential chain amortizes
across the whole batch.

The program is deliberately scatter-free: all sparse structure is expressed
as row-aligned gather-XOR passes, one-hot GF(2) matmuls, and static slice
updates (dynamic row-scatters cost ~30x on TPU).

Two backends share one program structure:
- "pallas" (TPU): fused in-VMEM kernels (ops/pallas_kernels.py) — bit-plane
  GF matmuls on the MXU and multi-DMA row gathers.
- "xla" (CPU tests / fallback): plain jnp from ops/gfmat.py.

jit-compiled per DeviceSchedule *shape* signature: canonical padding in the
compiler makes decode schedules for one K' share a compiled program.
"""

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_static
@dataclass(frozen=True)
class _Static:
    """Static pytree node: carries Python structure (e.g. range bounds)
    through a jitted pytree argument as part of the compile key, not data."""

    value: tuple

from nanorq_tpu.gf256.bitplane import companion_bits
from nanorq_tpu.ops import gfmat
from nanorq_tpu.precode.device_schedule import DeviceSchedule, GatherPlan



VINV_KB = 128  # K-block width for the Schur-inverse matmul (VMEM-bounded)


def default_backend() -> str:
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"


def _j_idx(x) -> jnp.ndarray:
    """Upload an index array; uint16 arrays (half the upload bytes) are cast
    to int32 on device — the gather kernels index with int32."""
    a = jnp.asarray(x)
    return a.astype(jnp.int32) if a.dtype == jnp.uint16 else a


def _plan_arrays(plan: GatherPlan) -> tuple:
    return (
        tuple(_j_idx(p) for p in plan.passes),
        tuple((_j_idx(ix), _j_idx(oh)) for ix, oh in plan.overflow),
    )


def _put_bits(x: np.ndarray) -> jnp.ndarray:
    """Upload a 0/1 uint8 matrix bit-packed (8x less host->device traffic;
    the relay-tunneled TPU moves ~20 MB/s).  Unpacked lazily *inside* the
    replay program so no extra kernels are compiled."""
    assert x.shape[-1] % 8 == 0
    packed = np.packbits(np.ascontiguousarray(x, np.uint8), axis=-1, bitorder="little")
    return jnp.asarray(packed)


def _unpack_bits(p: jnp.ndarray) -> jnp.ndarray:
    bits = (p[..., :, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    return bits.reshape(*p.shape[:-1], p.shape[-1] * 8)


def device_arrays(ds: DeviceSchedule, backend: str | None = None) -> dict:
    """Convert a DeviceSchedule into the jnp pytree the executor consumes.

    Cached on the schedule object: repeat codec calls must not re-upload
    (the index/bit tensors reach ~30 MB packed at K'=56403).
    """
    backend = backend or default_backend()
    cached = getattr(ds, "_dev_arrays", None)
    if cached is not None and cached[0] == backend:
        return cached[1]
    pallas = backend == "pallas"
    j = _j_idx
    mhd_bits = None
    if ds.mhd is not None:
        if pallas:
            from nanorq_tpu.ops.pallas_kernels import companion_bits_blocked

            mhd_bits = companion_bits_blocked(ds.mhd, ds.CB)  # CB always divides Lpad
        else:
            mhd_bits = companion_bits(ds.mhd)
        mhd_bits = _put_bits(mhd_bits)
    if pallas:
        from nanorq_tpu.ops.pallas_kernels import companion_bits_blocked

        vinv_bits = companion_bits_blocked(ds.vinv, min(ds.u_pad, VINV_KB))
    else:
        vinv_bits = companion_bits(ds.vinv)
    vinv_bits = _put_bits(vinv_bits)
    arr = {
        "pallas": pallas,
        "piv_rows": j(ds.piv_rows),
        "tri": tuple(
            {
                "tinv": jnp.asarray(seg.tinv),  # pre-packed bits
                "bounds": _Static(tuple((a, b) for a, b, _ in seg.ranges)),
                "ridx": tuple(j(ix) for _, _, ix in seg.ranges),
            }
            for seg in ds.tri  # segment q0 is implied by cumulative lengths
        ),
        "sel_rows": j(ds.sel_rows),
        "bsel": _plan_arrays(ds.bsel),
        "hd_sel": None if ds.mhd is None else j(ds.hd_sel),
        "mhd_bits": mhd_bits,
        "vinv_bits": vinv_bits,
        "wut_bits": jnp.asarray(ds.wut),  # pre-packed [Lpad, u_pad/8]
        "out_sel": j(ds.out_sel),
    }
    ds._dev_arrays = (backend, arr)
    _count_signature(arr)
    return arr


def _gf2mm(pallas: bool, bits, X):
    if pallas and X.shape[1] % 128 == 0:
        from nanorq_tpu.ops.pallas_kernels import gf2_matmul_pallas

        return gf2_matmul_pallas(bits, X)
    return gfmat.gf2_matmul(bits, X)


def _gf2mm_wide(pallas: bool, bits, X):
    """GF(2) matmul with a tall lhs (m = Lpad): tile m so the int32
    accumulator block stays within VMEM."""
    if pallas and X.shape[1] % 128 == 0:
        from nanorq_tpu.ops.pallas_kernels import gf2_matmul_pallas

        m = bits.shape[0]
        if m <= 512:
            return gf2_matmul_pallas(bits, X, mb=m)
        # m = Lpad is only guaranteed a multiple of CB (a public tuning
        # knob): tile with the largest divisor <= 512 so any CB works
        mb = next((d for d in (512, 256, 128, 64, 32, 16, 8) if m % d == 0), None)
        if mb is not None:
            return gf2_matmul_pallas(bits, X, mb=mb)
    return gfmat.gf2_matmul(bits, X)


def _gf256mm(pallas: bool, Mbits, X, kb):
    if pallas:
        # Mbits is in blocked-planar layout: no silent XLA fallback possible
        from nanorq_tpu.ops.pallas_kernels import gf256_matmul_pallas

        return gf256_matmul_pallas(Mbits, X, kb=kb)
    return gfmat.gf256_matmul_bits(Mbits, X)


# Gather profiles (v5e sweeps, tools/gather_v2_probe.py): replay chunk/stage
# gathers are fastest with many rows per step and mid-size tiles; the LT
# combine (n ~ S, high row reuse) is fastest with R=8 and full-row tiles.
_REPLAY_GP = (32, 20480)
_LT_GP = (8, None)


# Payload width where the DMA gather kernel starts beating XLA's gather
# (measured on v5e: at t=40960 the DMA kernel is ~4x XLA; at t<=6400 XLA
# wins — narrow row tiles pay per-DMA issue cost, and a pallas ANY-space
# operand forces per-chunk copies of the trisolve carry)
_PALLAS_GATHER_MIN_T = 16384


def _gather(pallas: bool, src, idx, gp=_REPLAY_GP):
    t = src.shape[1]
    # NANORQ_GATHER is read at trace time (per compile), so the knob stays
    # live after import — auto|xla|pallas.
    mode = os.environ.get("NANORQ_GATHER", "auto")
    use_pallas = pallas and t % 1024 == 0 and (
        mode == "pallas" or (mode == "auto" and t >= _PALLAS_GATHER_MIN_T)
    )
    if use_pallas:
        from nanorq_tpu.ops.pallas_kernels import gather_xor_pallas

        R, twmax = gp
        n = idx.shape[0]
        R = min(R, 8 if n <= 8 else 16 if n <= 16 else R)  # pad-to-R waste cap
        tw = t if twmax is None else min(twmax, t)
        return gather_xor_pallas(src, idx, R=R, tw=tw)
    return gfmat.xor_reduce_gather(src, idx)


def take_rows(pallas: bool, src: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Row gather src[rows] via the DMA kernel (XLA row-takes are slow)."""
    if pallas and src.shape[1] % 1024 == 0:
        return _gather(pallas, src, rows[:, None])
    return jnp.take(src, rows, axis=0)


def _select_rows(pallas: bool, red: jnp.ndarray, sel: jnp.ndarray, gp=_REPLAY_GP) -> jnp.ndarray:
    """red_ext[sel] with sentinel -> zero row (width-1 gather placement)."""
    red_ext = jnp.concatenate([red, jnp.zeros((1, red.shape[1]), jnp.uint8)], axis=0)
    return _gather(pallas, red_ext, sel[:, None], gp) if (pallas and red.shape[1] % 1024 == 0) else jnp.take(red_ext, sel, axis=0)


def _apply_plan(pallas: bool, src_ext: jnp.ndarray, plan, base: jnp.ndarray, gp=_REPLAY_GP) -> jnp.ndarray:
    """base ^= XOR-gathers of src_ext per GatherPlan (row-aligned, no scatters)."""
    passes, overflow = plan
    out = base
    for p in passes:
        out = out ^ _gather(pallas, src_ext, p, gp)
    for idx, sel in overflow:
        red = _gather(pallas, src_ext, idx, gp)
        out = out ^ _select_rows(pallas, red, sel, gp)
    return out


_SCAN_THRESHOLD = 12  # unroll short segments; scan longer ones


def _trisolve(arr: dict, y: jnp.ndarray, pallas: bool) -> jnp.ndarray:
    """y [Lpad, t] -> z [Lpad+1, t] = T^-1 y (last row zero sentinel).

    Triangle chunks run segment by segment; each segment's chunk loop is a
    lax.scan over uniform per-chunk arrays (compile time O(#segments)).
    """
    Lpad = arr["piv_rows"].shape[0]
    t = y.shape[1]
    z = jnp.zeros((Lpad + 1, t), jnp.uint8)

    q0 = 0
    for seg in arr["tri"]:
        tinv = _unpack_bits(seg["tinv"])
        nq, CB, _ = tinv.shape
        bounds = seg["bounds"].value  # static prefix ranges (chunk rows degree-sorted)

        def chunk_step(z, yq, tinv_q, ridx_q, q, bounds=bounds):
            # (a fused gather+matmul chunk kernel was tried and measured
            # slower: in-kernel serial DMA issue loses to the pipelined
            # gather kernel — see BENCH_NOTES.md)
            acc = yq
            for (a, b), ix in zip(bounds, ridx_q):
                acc = acc.at[a:b].set(acc[a:b] ^ _gather(pallas, z, ix))
            zq = _gf2mm(pallas, tinv_q, acc)
            return jax.lax.dynamic_update_slice_in_dim(z, zq, q * CB, 0)

        if nq <= _SCAN_THRESHOLD:
            for qi in range(nq):
                q = q0 + qi
                ridx_q = tuple(ix[qi] for ix in seg["ridx"])
                z = chunk_step(z, y[q * CB : (q + 1) * CB], tinv[qi], ridx_q, q)
        else:

            def body(z, xs, q0=q0, CB=CB):
                qi, tinv_q, ridx_q = xs
                q = q0 + qi
                yq = jax.lax.dynamic_slice_in_dim(y, q * CB, CB, 0)
                return chunk_step(z, yq, tinv_q, ridx_q, q), None

            qs = jnp.arange(nq)
            z, _ = jax.lax.scan(body, z, (qs, tinv, seg["ridx"]))
        q0 += nq
    return z


_seen_signatures: set = set()


def _count_signature(arr: dict) -> None:
    """Track distinct compile signatures (shape grid + static bounds): decode
    schedules of one K' should hit an already-compiled program almost always
    (ADVICE r2 #5) — the bench reports replay_compile_new vs replay_compile_hit.
    Called once per schedule from device_arrays (the payload width t is not
    part of the signature there; within one codec run t is constant), keeping
    the per-dispatch path free of tuple-building overhead."""
    from nanorq_tpu.utils import stats

    sig = (
        arr["piv_rows"].shape[0],
        tuple((s["tinv"].shape, s["bounds"].value, tuple(ix.shape for ix in s["ridx"])) for s in arr["tri"]),
        tuple(p.shape for p in arr["bsel"][0]),
        # overflow (ix, sel) shapes are data-dependent in warm-up plans and
        # are jit pytree leaves — omitting them over-reported program reuse
        tuple((ix.shape, sel.shape) for ix, sel in arr["bsel"][1]),
        arr["wut_bits"].shape,
        None if arr["mhd_bits"] is None else arr["mhd_bits"].shape,
        arr["vinv_bits"].shape,
        arr["out_sel"].shape,
    )
    if sig in _seen_signatures:
        stats.count("replay_compile_hit")
    else:
        _seen_signatures.add(sig)
        stats.count("replay_compile_new")


def replay_device(arr: dict, D: jnp.ndarray) -> jnp.ndarray:
    """Structured replay: D [M_pad, t] -> C [L, t]."""
    a = dict(arr)
    pallas = a.pop("pallas")
    return _replay_jit(a, D, pallas)


@partial(jax.jit, static_argnames=("pallas",))
def _replay_jit(arr: dict, D: jnp.ndarray, pallas: bool) -> jnp.ndarray:
    Lpad = arr["piv_rows"].shape[0]
    u_pad = arr["vinv_bits"].shape[0] // 8  # packed [8*u_pad, u_pad]
    t = D.shape[1]

    y = take_rows(pallas, D, arr["piv_rows"])  # [Lpad, t]
    z = _trisolve(arr, y, pallas)  # stage 1: t1 = T^-1 y

    # stage 2: zsel = y_sel ^ B_sel t1  (+ HDPC dense part)
    zsel = _apply_plan(pallas, z, arr["bsel"], take_rows(pallas, D, arr["sel_rows"]))
    if arr["mhd_bits"] is not None:
        CB = arr["tri"][0]["tinv"].shape[1]  # packed tinv [nq, CB, CB/8]
        hvals = _gf256mm(pallas, _unpack_bits(arr["mhd_bits"]), z[:Lpad], CB)  # [H_pad, t]
        zsel = zsel ^ _select_rows(pallas, hvals, arr["hd_sel"])

    # stage 3: x_u = Vinv zsel
    xu = _gf256mm(pallas, _unpack_bits(arr["vinv_bits"]), zsel, min(u_pad, VINV_KB))  # [u_pad, t]

    # stage 4: x_a = t1 ^ Wut x_u — the host-precomputed Wut = T^-1 U_t
    # replaces the former U_t gather + second trisolve with one GF(2) MXU
    # matmul (m-tiled: Lpad rows exceed one VMEM accumulator block)
    xa = z[:Lpad] ^ _gf2mm_wide(pallas, _unpack_bits(arr["wut_bits"]), xu)

    # stage 5: output gather
    allrows = jnp.concatenate([xa, xu], axis=0)
    return take_rows(pallas, allrows, arr["out_sel"])
