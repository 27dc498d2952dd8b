"""Compile a SolveState into the structured TPU replay program.

Instead of streaming ~3L..40L elementary row ops (whose dependency depth is
O(L) — hopeless on a wide machine), the device executes six batched stages
derived from the block factorization of A^{-1}:

  1. t1   = T^-1 y            block forward substitution: scan over CB-row
                              chunks; each step = sparse XOR-gather of
                              earlier-chunk deps + dense GF(2) matmul with
                              the precomputed chunk-inverse (MXU)
  2. zsel = y_sel ^ B_sel t1  sparse bucketed XOR-gather for binary rows,
                              dense GF(256) matmul (companion bit-planes,
                              MXU) for the <=H HDPC rows
  3. x_u  = Vinv zsel         dense GF(256) matmul with the precomputed
                              inverse of the u x u Schur pivot block
  4. w    = y ^ U_t x_u       sparse bucketed XOR-gather (original entries)
  5. x_a  = T^-1 w            stage-1 solve again
  6. C    = concat(x_a, x_u)[out_sel]

Stages 2-4 replace the reference's dense GE + backsolve replay entirely: the
host already knows the elimination's *net effect* (Vinv), so the device never
replays pivoting.  Sequential depth is 2*ceil(L/CB) + 4 instead of O(L).

All shapes are canonically padded (triangle to ceil(L/CB)*CB, u and bucket
widths to quantized sizes) so decode schedules for the same K' hit the same
compiled XLA program across loss patterns.

Reference analog being replaced: precode_matrix_intermediate + apply_sched
(lib/precode.c:23-32, 379-389).
"""

from dataclasses import dataclass

import numpy as np

from nanorq_tpu.gf256.bitplane import companion_bits, gf2_matmul_bytes, gf256_matmul_bytes
from nanorq_tpu.gf256.numpy_ops import gf_inv_matrix
from nanorq_tpu.precode.matrix import hdpc_full_rows
from nanorq_tpu.precode.solver import SolveState, _BIG

_WIDTHS = (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def _quant(n: int, grid=_WIDTHS) -> int:
    for w in grid:
        if n <= w:
            return w
    return int(grid[-1] * (1 + (n - 1) // grid[-1]))


def _pad_rows(n: int) -> int:
    return max(8, _quant(n))


@dataclass
class Bucket:
    """One width-class of a sparse XOR-gather: out[slots[r]] ^= XOR_c src[idx[r, c]]."""

    slots: np.ndarray  # int32 [nr] destination slots (trash slot for padding)
    idx: np.ndarray  # int32 [nr, w] source indices (zero-sentinel for padding)


def _bucketize(slots, deps, sentinel, trash_slot) -> list[Bucket]:
    """Group variable-length dep lists into quantized-width gather buckets."""
    counts = np.fromiter((len(d) for d in deps), np.int64, len(deps))
    out = []
    widths = sorted({_quant(int(c)) for c in counts[counts > 0]})
    lo = 0
    for w in widths:
        pick = np.nonzero((counts > lo) & (counts <= w))[0]
        lo = w
        if pick.size == 0:
            continue
        nr = _pad_rows(pick.size)
        sl = np.full(nr, trash_slot, np.int32)
        ix = np.full((nr, w), sentinel, np.int32)
        sl[: pick.size] = np.asarray(slots, np.int64)[pick]
        for r, p in enumerate(pick):
            d = deps[p]
            ix[r, : len(d)] = d
        out.append(Bucket(slots=sl, idx=ix))
    return out


@dataclass
class DeviceSchedule:
    """Structured replay program (all NumPy; converted to jnp at run time)."""

    L: int
    M: int  # logical rows of D used (= L + overhead)
    M_pad: int  # padded D rows the executor expects (>= M + 1, row M_pad-1 zero)
    i: int
    u: int
    CB: int
    Lpad: int  # ceil(L/CB)*CB: padded triangle size
    u_pad: int
    piv_rows: np.ndarray  # int32 [Lpad], D-row per triangle position (pad: zero row)
    tinv_bits: np.ndarray  # uint8 [nchunks, CB, CB] chunk-inverse bit matrices
    tdeps: list[list[Bucket]]  # per chunk: buckets of earlier-position deps
    sel_rows: np.ndarray  # int32 [u_pad] D-rows of dense pivot rows (pad: zero row)
    bsel: list[Bucket]  # binary sel-row deps into t1 (slots into zsel)
    hd_slots: np.ndarray | None  # int32 [H] zsel slot per HDPC row (trash if unused)
    mhd_bits: np.ndarray | None  # uint8 [8H, 8*Lpad] companion of Ahd[:, piv_cols]
    vinv_bits: np.ndarray  # uint8 [8*u_pad, 8*u_pad]
    ut: list[Bucket]  # triangle-row deps into x_u (slots = positions)
    out_sel: np.ndarray  # int32 [L] into concat(x_active[Lpad], x_u[u_pad])

    @property
    def nchunks(self) -> int:
        return self.Lpad // self.CB


def compile_device(st: SolveState, CB: int = 256) -> DeviceSchedule:
    P = st.P
    L, i, u, M = P.L, st.i, st.u, st.M
    Lpad = -(-L // CB) * CB
    u_pad = _quant(max(u, 1))
    M_pad = _pad_rows(M + 1)
    zero_row = M_pad - 1  # executor guarantees D[M_pad-1] == 0

    piv_rows = np.full(Lpad, zero_row, np.int32)
    piv_rows[:i] = st.piv_rows

    # --- triangle: per-position deps at pivot columns with smaller position ---
    kdeps: list[np.ndarray] = []
    for k in range(i):
        cols = st.rows_cols[int(st.piv_rows[k])]
        pos = st.pivpos_of_col[cols]
        kdeps.append(np.sort(pos[(pos >= 0) & (pos < k)]))
    nchunks = Lpad // CB
    tinv_bits = np.zeros((nchunks, CB, CB), np.uint8)
    tdeps: list[list[Bucket]] = []
    # z buffer layout: [Lpad + 1], index Lpad = zero sentinel
    for q in range(nchunks):
        base = q * CB
        T = np.eye(CB, dtype=np.uint8)
        ext_deps = []
        for r in range(CB):
            k = base + r
            if k < i:
                d = kdeps[k]
                ext_deps.append(d[d < base].astype(np.int64))
                ind = d[d >= base] - base
                T[r, ind] = 1
            else:
                ext_deps.append(np.zeros(0, np.int64))
        # invert unit-lower-triangular T over GF(2): row_k = e_k ^ xor(dep rows)
        Tinv = np.eye(CB, dtype=np.uint8)
        for r in range(CB):
            below = np.nonzero(T[r, :r])[0]
            for c in below:
                Tinv[r] ^= Tinv[c]
        tinv_bits[q] = Tinv
        # trash slot CB: the executor's per-chunk accumulator has one extra row
        tdeps.append(_bucketize(np.arange(CB), ext_deps, sentinel=Lpad, trash_slot=CB))

    # --- zsel: dense pivot rows ---
    order_sel = st.order[i : i + u]
    sel_rows = np.full(u_pad, zero_row, np.int32)
    sel_rows[:u] = order_sel.astype(np.int32)
    b_slots, b_deps = [], []
    hd_slots = None
    mhd_bits = None
    hd_sel = np.nonzero(order_sel >= st.NB)[0]
    for s in range(u):
        r = int(order_sel[s])
        if r < st.NB:
            cols = st.rows_cols[r]
            pos = st.pivpos_of_col[cols]
            b_slots.append(s)
            b_deps.append(np.sort(pos[pos >= 0]).astype(np.int64))
    bsel = _bucketize(b_slots, b_deps, sentinel=Lpad, trash_slot=u_pad)
    if st.hdpc_used:
        Ahd = hdpc_full_rows(P)
        Mhd = np.zeros((P.H, Lpad), np.uint8)
        if i:
            Mhd[:, :i] = Ahd[:, st.piv_cols]
        mhd_bits = companion_bits(Mhd)
        hd_slots = np.full(P.H, u_pad, np.int32)  # trash by default
        for s in hd_sel:
            hd_slots[int(order_sel[s]) - st.NB] = s

    # --- Vinv: inverse of the Schur pivot block, padded with identity ---
    V = np.eye(u_pad, dtype=np.uint8)
    if u:
        V[:u, :u] = st.U_schur[order_sel]
    Vinv = gf_inv_matrix(V)
    assert Vinv is not None  # solver succeeded => pivot block invertible
    vinv_bits = companion_bits(Vinv)

    # --- U_t: triangle rows' original inactive-column entries ---
    t_slots, t_deps = [], []
    for k in range(i):
        cols = st.rows_cols[int(st.piv_rows[k])]
        uc = st.ucol_of[cols]
        uc = uc[uc >= 0]
        if uc.size:
            t_slots.append(k)
            t_deps.append(np.sort(uc).astype(np.int64))
    ut = _bucketize(t_slots, t_deps, sentinel=u_pad, trash_slot=Lpad)

    # --- output gather ---
    out_sel = np.zeros(L, np.int32)
    out_sel[st.piv_cols] = np.arange(i)
    out_sel[st.u_cols] = Lpad + np.arange(u)

    return DeviceSchedule(
        L=L, M=M, M_pad=M_pad, i=i, u=u, CB=CB, Lpad=Lpad, u_pad=u_pad,
        piv_rows=piv_rows, tinv_bits=tinv_bits, tdeps=tdeps,
        sel_rows=sel_rows, bsel=bsel, hd_slots=hd_slots, mhd_bits=mhd_bits,
        vinv_bits=vinv_bits, ut=ut, out_sel=out_sel,
    )


# ---------------------------------------------------------------------------
# NumPy executor: exact mirror of the device program, used as test oracle.
# ---------------------------------------------------------------------------

def _xor_reduce_gather(src_ext: np.ndarray, bucket: Bucket, out: np.ndarray) -> None:
    g = src_ext[bucket.idx]  # [nr, w, t]
    red = np.bitwise_xor.reduce(g, axis=1)
    out[bucket.slots] ^= red


def _trisolve_np(ds: DeviceSchedule, y: np.ndarray) -> np.ndarray:
    """y [Lpad, t] -> z = T^-1 y, z buffer [Lpad+1, t] (last row zero)."""
    t = y.shape[1]
    z = np.zeros((ds.Lpad + 1, t), np.uint8)
    acc = np.zeros((ds.CB + 1, t), np.uint8)  # last row = trash slot
    for q in range(ds.nchunks):
        base = q * ds.CB
        acc[: ds.CB] = y[base : base + ds.CB]
        for b in ds.tdeps[q]:
            _xor_reduce_gather(z, b, acc)
        z[base : base + ds.CB] = gf2_matmul_bytes(ds.tinv_bits[q], acc[: ds.CB])
    return z


def replay_structured_numpy(D: np.ndarray, ds: DeviceSchedule) -> np.ndarray:
    """Apply the structured program to D [>=M_pad rows, t]; returns C [L, t].

    D must have its rows beyond ds.M zeroed (in particular row M_pad-1).
    """
    assert D.shape[0] >= ds.M_pad
    t = D.shape[1]
    y = D[ds.piv_rows]  # [Lpad, t]

    z = _trisolve_np(ds, y)  # stage 1

    zsel = np.zeros((ds.u_pad + 1, t), np.uint8)  # last row = trash
    zsel[: ds.u_pad] = D[ds.sel_rows]
    for b in ds.bsel:  # stage 2 sparse
        _xor_reduce_gather(z, b, zsel)
    if ds.mhd_bits is not None:  # stage 2 dense (HDPC)
        hvals = _gf256_bits_apply_np(ds.mhd_bits, z[: ds.Lpad])
        zext = np.zeros((ds.u_pad + 1, t), np.uint8)
        zext[ds.hd_slots] = hvals  # trash slot absorbs unselected rows
        zsel[: ds.u_pad] ^= zext[: ds.u_pad]

    xu = _gf256_bits_apply_np(ds.vinv_bits, zsel[: ds.u_pad])  # stage 3

    w = np.zeros((ds.Lpad + 1, t), np.uint8)  # last row = trash
    w[: ds.Lpad] = y
    xu_ext = np.vstack([xu, np.zeros((1, t), np.uint8)])
    for b in ds.ut:  # stage 4
        _xor_reduce_gather(xu_ext, b, w)

    xa = _trisolve_np(ds, w[: ds.Lpad])  # stage 5

    allrows = np.vstack([xa[: ds.Lpad], xu])
    return allrows[ds.out_sel]  # stage 6


def _gf256_bits_apply_np(Mbits: np.ndarray, X: np.ndarray) -> np.ndarray:
    from nanorq_tpu.gf256.bitplane import pack_bits, unpack_bits

    Xb = unpack_bits(X).astype(np.int32)
    Ob = (Mbits.astype(np.int32) @ Xb) & 1
    return pack_bits(Ob.astype(np.uint8))
