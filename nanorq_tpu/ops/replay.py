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

from functools import partial

import jax
import jax.numpy as jnp

from nanorq_tpu.gf256.bitplane import companion_bits
from nanorq_tpu.ops import gfmat
from nanorq_tpu.precode.device_schedule import DeviceSchedule, GatherPlan

MHD_KB = 2048  # K-block width for the (large-k) HDPC companion matmul


def default_backend() -> str:
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"


def _plan_arrays(plan: GatherPlan) -> tuple:
    j = jnp.asarray
    return (
        tuple(j(p) for p in plan.passes),
        tuple((j(ix), j(oh)) for ix, oh in plan.overflow),
    )


def device_arrays(ds: DeviceSchedule, backend: str | None = None) -> dict:
    """Convert a DeviceSchedule into the jnp pytree the executor consumes."""
    backend = backend or default_backend()
    pallas = backend == "pallas"
    j = jnp.asarray
    mhd_bits = None
    if ds.mhd is not None:
        if pallas:
            from nanorq_tpu.ops.pallas_kernels import companion_bits_blocked

            mhd_bits = companion_bits_blocked(ds.mhd, min(MHD_KB, ds.Lpad))
        else:
            mhd_bits = companion_bits(ds.mhd)
    if pallas:
        from nanorq_tpu.ops.pallas_kernels import companion_bits_blocked

        vinv_bits = companion_bits_blocked(ds.vinv, ds.u_pad)
    else:
        vinv_bits = companion_bits(ds.vinv)
    return {
        "pallas": pallas,
        "piv_rows": j(ds.piv_rows),
        "tinv": j(ds.tinv_bits),
        "tdeps": tuple(_plan_arrays(p) for p in ds.tdeps),
        "sel_rows": j(ds.sel_rows),
        "bsel": _plan_arrays(ds.bsel),
        "hd_onehot": None if ds.mhd is None else j(ds.hd_onehot),
        "mhd_bits": mhd_bits if ds.mhd is None else j(mhd_bits),
        "vinv_bits": j(vinv_bits),
        "ut": _plan_arrays(ds.ut),
        "out_sel": j(ds.out_sel),
    }


def _gf2mm(pallas: bool, bits, X):
    if pallas and X.shape[1] % 128 == 0:
        from nanorq_tpu.ops.pallas_kernels import gf2_matmul_pallas

        return gf2_matmul_pallas(bits, X)
    return gfmat.gf2_matmul(bits, X)


def _gf256mm(pallas: bool, Mbits, X, kb):
    if pallas:
        # Mbits is in blocked-planar layout: no silent XLA fallback possible
        from nanorq_tpu.ops.pallas_kernels import gf256_matmul_pallas

        return gf256_matmul_pallas(Mbits, X, kb=kb)
    return gfmat.gf256_matmul_bits(Mbits, X)


def _gather(pallas: bool, src, idx):
    if pallas and src.shape[1] % 1024 == 0:
        from nanorq_tpu.ops.pallas_kernels import gather_xor_pallas

        return gather_xor_pallas(src, idx)
    return gfmat.xor_reduce_gather(src, idx)


def take_rows(pallas: bool, src: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Row gather src[rows] via the DMA kernel (XLA row-takes are slow)."""
    if pallas and src.shape[1] % 1024 == 0:
        return _gather(pallas, src, rows[:, None])
    return jnp.take(src, rows, axis=0)


def _apply_plan(pallas: bool, src_ext: jnp.ndarray, plan, base: jnp.ndarray) -> jnp.ndarray:
    """base ^= XOR-gathers of src_ext per GatherPlan (row-aligned, no scatters)."""
    passes, overflow = plan
    out = base
    for p in passes:
        out = out ^ _gather(pallas, src_ext, p)
    for idx, onehot in overflow:
        red = _gather(pallas, src_ext, idx)
        out = out ^ _gf2mm(pallas, onehot, red)
    return out


def _trisolve(arr: dict, y: jnp.ndarray, pallas: bool) -> jnp.ndarray:
    """y [Lpad, t] -> z [Lpad+1, t] = T^-1 y (last row zero sentinel)."""
    nchunks, CB, _ = arr["tinv"].shape
    t = y.shape[1]
    z = jnp.zeros((nchunks * CB + 1, t), jnp.uint8)
    for q in range(nchunks):
        acc = _apply_plan(pallas, z, arr["tdeps"][q], y[q * CB : (q + 1) * CB])
        zq = _gf2mm(pallas, arr["tinv"][q], acc)
        z = z.at[q * CB : (q + 1) * CB].set(zq)
    return z


def replay_device(arr: dict, D: jnp.ndarray) -> jnp.ndarray:
    """Structured replay: D [M_pad, t] -> C [L, t]."""
    a = dict(arr)
    pallas = a.pop("pallas")
    return _replay_jit(a, D, pallas)


@partial(jax.jit, static_argnames=("pallas",))
def _replay_jit(arr: dict, D: jnp.ndarray, pallas: bool) -> jnp.ndarray:
    Lpad = arr["piv_rows"].shape[0]
    u_pad = arr["vinv_bits"].shape[0] // 8
    t = D.shape[1]

    y = take_rows(pallas, D, arr["piv_rows"])  # [Lpad, t]
    z = _trisolve(arr, y, pallas)  # stage 1: t1 = T^-1 y

    # stage 2: zsel = y_sel ^ B_sel t1  (+ HDPC dense part)
    zsel = _apply_plan(pallas, z, arr["bsel"], take_rows(pallas, D, arr["sel_rows"]))
    if arr["mhd_bits"] is not None:
        kb = min(MHD_KB, Lpad)
        hvals = _gf256mm(pallas, arr["mhd_bits"], z[:Lpad], kb)  # [H_pad, t]
        zsel = zsel ^ _gf2mm(pallas, arr["hd_onehot"], hvals)

    # stage 3: x_u = Vinv zsel
    xu = _gf256mm(pallas, arr["vinv_bits"], zsel, u_pad)  # [u_pad, t]

    # stage 4: w = y ^ U_t x_u (original sparse entries)
    xu_ext = jnp.concatenate([xu, jnp.zeros((1, t), jnp.uint8)], axis=0)
    w = _apply_plan(pallas, xu_ext, arr["ut"], y)

    # stage 5: x_active = T^-1 w
    xa = _trisolve(arr, w, pallas)

    # stage 6: output gather
    allrows = jnp.concatenate([xa[:Lpad], xu], axis=0)
    return take_rows(pallas, allrows, arr["out_sel"])
