"""Device executor for the structured precode replay program.

Runs the 6-stage program from precode.device_schedule on a payload matrix
D [M_pad, t] (uint8, rows beyond the logical system zeroed), producing the
intermediate symbols C [L, t].  The payload axis t is the batching axis: the
codec lays out B independent blocks side by side (t = B*T), so every stage
is a wide VPU/MXU op and the ~2*Lpad/CB-step sequential chain amortizes
across the whole batch.

jit-compiled per DeviceSchedule *shape* signature: canonical padding in the
compiler makes decode schedules for one K' share a compiled program.
"""

from functools import partial

import jax
import jax.numpy as jnp

from nanorq_tpu.ops.gfmat import apply_bucket, gf2_matmul, gf256_matmul_bits
from nanorq_tpu.precode.device_schedule import DeviceSchedule


def device_arrays(ds: DeviceSchedule) -> dict:
    """Convert a DeviceSchedule into the jnp pytree the executor consumes."""
    j = jnp.asarray
    return {
        "piv_rows": j(ds.piv_rows),
        "tinv": j(ds.tinv_bits),
        "tdeps": tuple(tuple((j(b.slots), j(b.idx)) for b in ch) for ch in ds.tdeps),
        "sel_rows": j(ds.sel_rows),
        "bsel": tuple((j(b.slots), j(b.idx)) for b in ds.bsel),
        "hd_slots": None if ds.hd_slots is None else j(ds.hd_slots),
        "mhd_bits": None if ds.mhd_bits is None else j(ds.mhd_bits),
        "vinv_bits": j(ds.vinv_bits),
        "ut": tuple((j(b.slots), j(b.idx)) for b in ds.ut),
        "out_sel": j(ds.out_sel),
    }


def _trisolve(arr: dict, y: jnp.ndarray) -> jnp.ndarray:
    """y [Lpad, t] -> z [Lpad+1, t] = T^-1 y (last row zero sentinel)."""
    nchunks, CB, _ = arr["tinv"].shape
    t = y.shape[1]
    z = jnp.zeros((nchunks * CB + 1, t), jnp.uint8)
    for q in range(nchunks):
        acc = jnp.zeros((CB + 1, t), jnp.uint8)
        acc = acc.at[:CB].set(jax.lax.dynamic_slice_in_dim(y, q * CB, CB, 0))
        for slots, idx in arr["tdeps"][q]:
            acc = apply_bucket(z, acc, slots, idx)
        zq = gf2_matmul(arr["tinv"][q], acc[:CB])
        z = jax.lax.dynamic_update_slice_in_dim(z, zq, q * CB, 0)
    return z


@partial(jax.jit, static_argnames=())
def replay_device(arr: dict, D: jnp.ndarray) -> jnp.ndarray:
    """Structured replay: D [M_pad, t] -> C [L, t]."""
    Lpad = arr["piv_rows"].shape[0]
    u_pad = arr["vinv_bits"].shape[0] // 8
    t = D.shape[1]

    y = jnp.take(D, arr["piv_rows"], axis=0)  # [Lpad, t]
    z = _trisolve(arr, y)  # stage 1: t1 = T^-1 y

    # stage 2: zsel = y_sel ^ B_sel t1  (+ HDPC dense part)
    zsel = jnp.zeros((u_pad + 1, t), jnp.uint8)
    zsel = zsel.at[:u_pad].set(jnp.take(D, arr["sel_rows"], axis=0))
    for slots, idx in arr["bsel"]:
        zsel = apply_bucket(z, zsel, slots, idx)
    if arr["mhd_bits"] is not None:
        hvals = gf256_matmul_bits(arr["mhd_bits"], z[:Lpad])  # [H, t]
        zext = jnp.zeros((u_pad + 1, t), jnp.uint8).at[arr["hd_slots"]].set(hvals, mode="drop")
        zsel = zsel.at[:u_pad].set(zsel[:u_pad] ^ zext[:u_pad])

    # stage 3: x_u = Vinv zsel
    xu = gf256_matmul_bits(arr["vinv_bits"], zsel[:u_pad])  # [u_pad, t]

    # stage 4: w = y ^ U_t x_u (original sparse entries)
    w = jnp.zeros((Lpad + 1, t), jnp.uint8).at[:Lpad].set(y)
    xu_ext = jnp.concatenate([xu, jnp.zeros((1, t), jnp.uint8)], axis=0)
    for slots, idx in arr["ut"]:
        w = apply_bucket(xu_ext, w, slots, idx)

    # stage 5: x_active = T^-1 w
    xa = _trisolve(arr, w[:Lpad])

    # stage 6: output gather
    allrows = jnp.concatenate([xa[:Lpad], xu], axis=0)
    return jnp.take(allrows, arr["out_sel"], axis=0)
