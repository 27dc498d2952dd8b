"""Public codec API: Encoder / Decoder objects over pluggable I/O.

Functional parity with the 20-function reference API (include/nanorq.h):
object lifecycle, OTI words, per-symbol and batched encode, decoder symbol
ingestion with ADDED/IGN/DUP/ERR statuses, gap tracking, block repair,
precalculate/reset/cleanup.  The compute path differs by design: schedules
are solved on host (precode.solver), payload math runs on device via the
structured replayer (ops.replay) and batched LT combine (ops.lt).

Mirrored reference behaviors worth noting:
- precode params derive from block 0's K and are shared by all blocks
  (lib/nanorq.c:289: params_init(nanorq_block_symbols(rq, 0))), including
  the repair-ISI padding shift Kprime - K (nanorq.c:429).
- decoder max_esi defaults to 2*K' (nanorq.c:374) and repair beyond it is
  rejected; nanorq_set_max_esi analog via the max_esi property.
- encoder T adjustment: Al clamp, T rounded down to Al, grown while the
  transfer exceeds Z_max*K_max symbols (nanorq.c:252-272).
"""

import os

import numpy as np

from nanorq_tpu.codec import cache as _cache
from nanorq_tpu.codec.oti import pack_oti_common, pack_oti_scheme, split_tag
from nanorq_tpu.codec.partition import Scheme, div_ceil, make_scheme, scheme_from_oti, symbol_ranges
from nanorq_tpu.codec.oti import unpack_oti_common, unpack_oti_scheme
from nanorq_tpu.io.ioctx import IOContext
from nanorq_tpu.rfc.params import Params, params_init
from nanorq_tpu.rfc.tables import K_MAX, MAX_TRANSFER, Z_MAX

# symbol ingestion statuses (include/nanorq.h:10-13)
SYM_ADDED = 0
SYM_IGN = 1
SYM_DUP = 2
SYM_ERR = -1

# shared all-zeros symbol rows (per T), read-only: padding/constraint rows of
# the patched system point here in the host arm's zero-copy row-pointer map
_ZERO_ROWS: dict[int, np.ndarray] = {}


# K' at or below which the auto decode policy prefers the solve-free host
# residual arm over the patched-system host solve for cold patterns
# (measured crossover ~K'=250 on an AVX-512 host: res_host 8.6 vs host 6.8
# at K=200, 6.3 vs 8.7 at K=320; see _repair_residual_host_batch)
_RES_HOST_MAX = int(os.environ.get("NANORQ_RES_HOST_MAX", "256"))


def _zero_row(T: int) -> np.ndarray:
    z = _ZERO_ROWS.get(T)
    if z is None:
        z = _ZERO_ROWS.setdefault(T, np.zeros(T, np.uint8))
    return z


class _Block:
    """Per-SBN working state (reference struct block_encoder, nanorq.c:40-47).

    Source-ESI tracking is a bool array + count (the bitmask analog,
    lib/bitmask.c) so batched ingest and gap queries are vectorized; repair
    ESIs (sparse, unbounded) stay in a set.
    """

    __slots__ = ("K", "D", "C", "loaded", "got", "nsrc",
                 "rep_esis", "rep_rows", "nrep", "rep_seen")

    def __init__(self, K: int):
        self.K = K
        self.D: np.ndarray | None = None  # [M_pad, T] payload matrix
        self.C = None  # device intermediate symbols [L, T]
        self.loaded = False
        self.got = np.zeros(K, bool)  # received source esis
        self.nsrc = 0  # = got.sum(), tracked incrementally
        # repair symbols live in ONE contiguous [cap, T] buffer (doubling
        # growth) so repair-time fills and per-row address math vectorize
        self.rep_esis = np.empty(8, np.int64)
        self.rep_rows: np.ndarray | None = None
        self.nrep = 0
        self.rep_seen: set[int] = set()

    def add_repair(self, esis: np.ndarray, payloads: np.ndarray):
        """Append repair rows (esis int [n], payloads uint8 [n, T])."""
        n = int(esis.size)
        need = self.nrep + n
        if self.rep_rows is None or need > self.rep_rows.shape[0]:
            cap = max(8, 1 << (need - 1).bit_length())
            rows = np.empty((cap, payloads.shape[1]), np.uint8)
            if self.nrep:
                rows[: self.nrep] = self.rep_rows[: self.nrep]
            self.rep_rows = rows
            if cap > self.rep_esis.size:
                e = np.empty(cap, np.int64)
                e[: self.nrep] = self.rep_esis[: self.nrep]
                self.rep_esis = e
        self.rep_esis[self.nrep : need] = esis
        self.rep_rows[self.nrep : need] = payloads
        self.nrep = need
        self.rep_seen.update(int(x) for x in esis)

    def reset(self):
        self.D = None
        self.C = None
        self.loaded = False
        self.got[:] = False
        self.nsrc = 0
        self.nrep = 0
        self.rep_rows = None
        self.rep_seen.clear()


class _CodecBase:
    scheme: Scheme
    P: Params

    def __init__(self):
        self._blocks: dict[int, _Block] = {}

    # --- introspection (nanorq.h parity) ---
    def oti_common(self) -> int:
        return pack_oti_common(self.scheme.F, self.scheme.T)

    def oti_scheme_specific(self) -> int:
        return pack_oti_scheme(self.scheme.Z, self.scheme.N, self.scheme.Al)

    @property
    def transfer_length(self) -> int:
        return self.scheme.F

    @property
    def symbol_size(self) -> int:
        return self.scheme.T

    @property
    def num_blocks(self) -> int:
        return self.scheme.blocks

    @property
    def max_blocks(self) -> int:
        return Z_MAX

    def block_symbols(self, sbn: int) -> int:
        return self.scheme.block_symbols(sbn)

    def _block(self, sbn: int) -> _Block:
        b = self._blocks.get(sbn)
        if b is None:
            b = _Block(self.block_symbols(sbn))
            self._blocks[sbn] = b
        return b

    def cleanup(self, sbn: int) -> None:
        self._blocks.pop(sbn, None)

    def reset(self, sbn: int) -> None:
        b = self._blocks.get(sbn)
        if b is not None:
            b.reset()

    # --- shared I/O scatter/gather ---
    def _read_symbol(self, io: IOContext, sbn: int, esi: int, K: int) -> np.ndarray:
        out = np.zeros(self.scheme.T, np.uint8)
        for off, length, col in symbol_ranges(self.scheme, sbn, esi, K):
            data = io.read_at(off, length)
            out[col : col + len(data)] = np.frombuffer(data, np.uint8)
        return out

    def _write_symbol(self, io: IOContext, sbn: int, esi: int, K: int, payload: np.ndarray) -> None:
        for off, length, col in symbol_ranges(self.scheme, sbn, esi, K):
            io.write_at(off, payload[col : col + length])

    def _write_symbols_coalesced(self, io: IOContext, sbn: int, esis, K: int, payloads: np.ndarray) -> None:
        """Write-through many symbols with adjacent byte ranges merged into
        single io.write_at calls (in-order N=1 bursts collapse to one write)."""
        if self.scheme.N == 1:  # vectorized fast path: one range per symbol
            T = self.scheme.T
            base = symbol_ranges(self.scheme, sbn, 0, K)[0][0]
            es = np.asarray(esis, np.int64)
            offs = base + es * T
            pl = np.asarray(payloads, np.uint8)
            F = self.scheme.F
            full = offs + T <= F
            if full.any():
                # the io backend scatters row-aligned offsets vectorized
                # (MemoryIO) or merges adjacent runs into single writes
                io.write_rows_at(offs[full], pl[full])
            for i in np.nonzero(~full)[0]:  # final short symbol: clamp to F
                off = int(offs[i])
                if off < F:
                    io.write_at(off, pl[i][: F - off])
            return
        segs = []  # (object offset, length, payload row, payload col)
        for r, esi in enumerate(esis):
            for off, length, col in symbol_ranges(self.scheme, sbn, int(esi), K):
                segs.append((off, length, r, col))
        segs.sort()
        i = 0
        while i < len(segs):
            j = i
            end = segs[i][0] + segs[i][1]
            while j + 1 < len(segs) and segs[j + 1][0] == end:
                j += 1
                end = segs[j][0] + segs[j][1]
            data = (
                payloads[segs[i][2]][segs[i][3] : segs[i][3] + segs[i][1]]
                if j == i
                else np.concatenate([payloads[r][c : c + ln] for (_, ln, r, c) in segs[i : j + 1]])
            )
            io.write_at(segs[i][0], data)
            i = j + 1


class Encoder(_CodecBase):
    """Systematic RaptorQ encoder (reference nanorq_encoder_new_ex path)."""

    def __init__(self, transfer_length: int, symbol_size: int, Al: int = 4, K: int = 0, Z: int = 0, N: int = 1):
        super().__init__()
        if transfer_length > MAX_TRANSFER:
            raise ValueError("transfer too large")
        # clamp alignment to the largest supported value <= Al (nanorq.c:252-259)
        for a in (8, 4, 2, 1):
            if Al >= a:
                Al = a
                break
        else:
            Al = 1
        T = max(symbol_size, Al)
        T -= T % Al
        # grow T until the transfer fits the symbol budget; step by at least
        # 2 so Al=1 cannot loop forever (reference nanorq.c:271 has that bug)
        while div_ceil(transfer_length, T) > Z_MAX * K_MAX:
            T *= max(Al, 2)
        if T > 1 << 16:
            # the OTI common word stores T-1 in 16 bits (codec/oti.py)
            raise ValueError(f"symbol size {T} exceeds the 65536-byte OTI limit")
        self.scheme = make_scheme(transfer_length, T, Al, K=K, Z=Z, N=N)
        self.P = params_init(max(1, self.scheme.block_symbols(0)))

    # --- schedule management ---
    def precalculate(self) -> bool:
        """Solve (and cache) the loss-independent encoder schedule."""
        _cache.encoder_schedule(self.P.Kp)
        return True

    def _load(self, io: IOContext, sbn: int) -> _Block:
        b = self._block(sbn)
        if not b.loaded:
            ds = _cache.encoder_schedule(self.P.Kp)
            D = np.zeros((ds.M_pad, self.scheme.T), np.uint8)
            for esi in range(b.K):
                D[esi] = self._read_symbol(io, sbn, esi, b.K)
            b.D = D
            b.loaded = True
        return b

    def generate_symbols(self, sbn: int, io: IOContext, mesh=None) -> bool:
        """Compute the block's intermediate symbols (nanorq_generate_symbols).

        Pass a 1-D jax.sharding.Mesh to shard the payload width over its
        devices: the structured replay is a stream of row ops, columnwise
        independent, so width sharding is zero-collective SPMD.  (For
        whole-object multi-block encodes prefer codec.batch, which lays
        blocks side by side on the width axis before sharding.)
        """
        b = self._load(io, sbn)
        if b.C is not None:
            return True
        import jax.numpy as jnp

        from nanorq_tpu.ops.replay import device_arrays, replay_device

        ds = _cache.encoder_schedule(self.P.Kp)
        arr = device_arrays(ds)
        if mesh is not None:
            from nanorq_tpu.parallel.mesh import pad_width, replay_sharded, shard_width

            Dp = pad_width(b.D, int(np.prod(mesh.devices.shape)))
            b.C = replay_sharded(arr, shard_width(Dp, mesh), mesh)
        else:
            b.C = replay_device(arr, jnp.asarray(b.D))
        return True

    def encode_batch(self, sbn: int, esis: np.ndarray, io: IOContext, mesh=None) -> np.ndarray:
        """Encode many symbols of one block at once -> [n, T] uint8.

        Source ESIs (esi < K) are served from the loaded symbol matrix
        (systematic fast path, nanorq.c:414-420); repair ESIs from the
        batched LT combine over the device intermediates.  With `mesh`, the
        LT combine runs sharded on the payload width (and the intermediates
        are generated sharded if not yet present).
        """
        esis = np.asarray(esis, dtype=np.int64)
        b = self._load(io, sbn)
        T = self.scheme.T
        out = np.zeros((len(esis), T), np.uint8)
        src_mask = esis < b.K
        if src_mask.any():
            out[src_mask] = b.D[esis[src_mask]]
        rep = np.nonzero(~src_mask)[0]
        if rep.size:
            if b.C is None:
                self.generate_symbols(sbn, io, mesh=mesh)
            from nanorq_tpu.ops.lt import lt_combine, lt_plan

            isis = (esis[rep] + (self.P.Kp - b.K)).astype(np.uint32)
            plan = lt_plan(isis, self.P)
            if mesh is not None and b.C.shape[1] % int(np.prod(mesh.devices.shape)) == 0:
                from nanorq_tpu.parallel.mesh import lt_sharded

                sym = np.asarray(lt_sharded(b.C, plan, mesh))
            else:
                sym = np.asarray(lt_combine(b.C, plan))
            out[rep] = sym[: rep.size, :T]
        return out

    def encode(self, esi: int, sbn: int, io: IOContext) -> np.ndarray:
        """Single-symbol encode (nanorq_encode parity)."""
        if esi > (1 << 24) - 1:
            raise ValueError("esi out of range")
        return self.encode_batch(sbn, np.array([esi]), io)[0]


class _BatchResult:
    """Shared lazy handle on one stacked device result [nb, m, T]: the first
    host access fetches the WHOLE batch in one transfer; every member view
    slices that host copy."""

    __slots__ = ("dev", "_host")

    def __init__(self, dev):
        self.dev = dev
        self._host = None

    def host(self):
        if self._host is None:
            self._host = np.asarray(self.dev)
        return self._host


class _BatchView:
    """One block's [m, T] slice of a _BatchResult.  np.asarray() resolves
    through the batch's single fetch; item access stays a lazy device slice
    (benchmarks sync on view[0, :4] without pulling payloads)."""

    __slots__ = ("res", "j")

    def __init__(self, res: _BatchResult, j: int):
        self.res = res
        self.j = j

    def __array__(self, dtype=None, copy=None):
        a = self.res.host()[self.j]
        return a if dtype is None else a.astype(dtype)

    def __getitem__(self, k):
        return self.res.dev[self.j][k]


class Decoder(_CodecBase):
    """RaptorQ decoder (reference nanorq_decoder_new / add_symbol / repair)."""

    def __init__(self, oti_common: int, oti_scheme: int):
        super().__init__()
        F, T = unpack_oti_common(oti_common)
        Z, N, Al = unpack_oti_scheme(oti_scheme)
        if F > MAX_TRANSFER:
            raise ValueError("transfer too large")
        self.scheme = scheme_from_oti(F, T, Al, Z, N)
        self.P = params_init(max(1, self.scheme.block_symbols(0)))
        self.max_esi = 2 * self.P.Kp

    def set_max_esi(self, max_esi: int) -> bool:
        if max_esi >= (1 << 24) or max_esi < self.P.Kp:
            return False
        self.max_esi = max_esi
        return True

    def add_symbol(self, data, tag: int, io: IOContext) -> int:
        """Ingest one received symbol (nanorq_decoder_add_symbol parity)."""
        sbn, esi = split_tag(tag)
        if sbn >= self.num_blocks or esi > self.max_esi:
            return SYM_ERR
        payload = np.frombuffer(bytes(data), np.uint8).copy() if not isinstance(data, np.ndarray) else data.astype(np.uint8).copy()
        if len(payload) != self.scheme.T:
            return SYM_ERR  # malformed beats DUP: a bad packet is never "seen"
        b = self._block(sbn)
        if b.nsrc == b.K:
            return SYM_IGN
        if b.got[esi] if esi < b.K else esi in b.rep_seen:
            return SYM_DUP
        if esi < b.K:
            if b.D is None:
                b.D = np.zeros((self._d_rows(), self.scheme.T), np.uint8)
            b.D[esi] = payload
            self._write_symbol(io, sbn, esi, b.K, payload)
            b.got[esi] = True
            b.nsrc += 1
        else:
            b.add_repair(np.array([esi], np.int64), payload[None])
        return SYM_ADDED

    def _d_rows(self) -> int:
        # room for Kp LT rows + max overhead + S + H, padded generously;
        # the repair-time D is rebuilt at the schedule's exact M_pad anyway
        return self.P.Kp + 1

    def add_symbols(self, payloads: np.ndarray, tags, io: IOContext) -> list[int]:
        """Batched ingestion: payloads [n, T] with per-symbol tags.

        Returns the per-symbol status list with add_symbol's exact in-order
        semantics (first occurrence ADDED, later DUP; symbols arriving after
        the block completes IGN), but vectorized: one payload-matrix write
        per block and coalesced write-through I/O instead of n passes.
        """
        payloads = np.asarray(payloads, np.uint8)
        if payloads.ndim == 1:
            payloads = payloads[None]
        try:
            tags_arr = np.asarray(tags, dtype=np.int64)
        except (TypeError, ValueError):
            tags_arr = np.fromiter((int(t) for t in tags), np.int64, count=len(tags))
        n = tags_arr.shape[0]
        if payloads.shape[0] != n or payloads.shape[1] != self.scheme.T:
            return [SYM_ERR] * n
        sbns = (tags_arr >> 24) & 0xFF
        esis = tags_arr & 0xFFFFFF
        fast = self._add_symbols_fast(payloads, sbns, esis, io)
        if fast is not None:
            return fast
        statuses = np.empty(n, np.int64)
        for sbn in np.unique(sbns):
            idxs = np.nonzero(sbns == sbn)[0]
            if sbn >= self.num_blocks:
                statuses[idxs] = SYM_ERR
                continue
            b = self._block(int(sbn))
            e = esis[idxs]
            st = np.full(e.shape, SYM_ADDED, np.int64)
            st[e > self.max_esi] = SYM_ERR
            ok = st == SYM_ADDED
            # duplicates: against already-received and within-batch repeats
            is_src = e < b.K
            dup = np.zeros(e.shape, bool)
            dup[is_src] = b.got[e[is_src]]
            if b.rep_seen:
                rep_i = np.nonzero(ok & ~is_src)[0]
                dup[rep_i] = np.fromiter((int(x) in b.rep_seen for x in e[rep_i]), bool, rep_i.size)
            first = np.zeros(e.shape, bool)
            first[np.unique(e, return_index=True)[1]] = True
            st[ok & (dup | ~first)] = SYM_DUP
            ok = st == SYM_ADDED
            # in-order completion: a symbol is IGN if the block was already
            # complete before it (new source symbols fill gaps as they land)
            missing = b.K - b.nsrc
            new_src = ok & is_src
            filled_before = np.concatenate([[0], np.cumsum(new_src)[:-1]])
            ign = (st != SYM_ERR) & (filled_before >= missing)
            st[ign] = SYM_IGN
            ok = st == SYM_ADDED
            src = ok & is_src
            if src.any():
                pe = e[src]
                pidx = idxs[src]
                if pidx.size > 1 and pidx[-1] - pidx[0] == pidx.size - 1:
                    pl = payloads[pidx[0] : pidx[-1] + 1]  # contiguous: no copy
                else:
                    pl = payloads[pidx]
                self._write_symbols_coalesced(io, int(sbn), pe, b.K, pl)
                b.got[pe] = True
                b.nsrc += pe.size
                if b.nsrc < b.K:  # incomplete: keep rows for a later repair
                    if b.D is None:
                        b.D = np.zeros((self._d_rows(), self.scheme.T), np.uint8)
                    b.D[pe] = pl
                # complete: repair is a no-op, the D rows would never be read
            rep = np.nonzero(ok & ~src)[0]
            if rep.size:
                b.add_repair(e[rep], payloads[idxs[rep]])
            statuses[idxs] = st
        return statuses.tolist()

    def _add_symbols_fast(self, payloads, sbns, esis, io: IOContext):
        """Whole-batch ingestion fast path: a duplicate-free source-symbol
        burst into untouched blocks (the common 0%-loss in-order delivery
        case).  All statuses are ADDED by construction; writes collapse to
        one io.write_at per contiguous run.  Returns None when any
        precondition fails (the general per-block path handles it).

        The run-coalescing here intentionally parallels
        _write_symbols_coalesced but works on OBJECT offsets across all
        blocks at once — a whole in-order object burst merges into a single
        write, which per-block delegation could not do.
        """
        if self.scheme.N != 1 or sbns.size == 0:
            return None
        src = self.scheme.src
        if int(sbns.max()) >= self.num_blocks:
            return None
        Ks = np.where(sbns < src.JL, src.IL, src.IS)
        if (esis >= Ks).any():
            return None
        usbns = np.unique(sbns)
        for s in usbns:
            b = self._blocks.get(int(s))
            if b is not None and (b.nsrc or b.nrep or b.D is not None):
                return None
        T = self.scheme.T
        base = np.where(sbns < src.JL, sbns * src.IL,
                        src.IL * src.JL + (sbns - src.JL) * src.IS) * T
        off = base + esis * T
        d = np.diff(off)
        if (d > 0).all():  # already in object order (the common burst shape)
            order = np.arange(off.size)
            off_s, d_s = off, d
        else:
            order = np.argsort(off, kind="stable")
            off_s = off[order]
            d_s = np.diff(off_s)
        if (d_s == 0).any():
            return None  # within-batch duplicate
        brk = np.nonzero(d_s != T)[0] + 1
        F = self.scheme.F
        for s, e in zip(np.r_[0, brk], np.r_[brk, off_s.size]):
            o0 = int(off_s[s])
            idx = order[s:e]
            if idx[-1] - idx[0] == idx.size - 1 and (idx.size == 1 or bool((np.diff(idx) == 1).all())):
                chunk = payloads[idx[0] : idx[-1] + 1].reshape(-1)  # in-order: no copy
            else:
                chunk = payloads[idx].reshape(-1)
            length = min(chunk.size, max(0, F - o0))
            if length > 0:
                io.write_at(o0, chunk[:length])
        for s in usbns:
            b = self._block(int(s))
            m = sbns == s
            cnt = int(m.sum())
            if cnt == b.K:  # complete: every esi 0..K-1 present exactly once
                b.got[:] = True
                b.nsrc = b.K
            else:  # partial burst: keep rows for a later repair
                pe = esis[m]
                b.got[pe] = True
                b.nsrc = cnt
                if b.D is None:
                    b.D = np.zeros((self._d_rows(), T), np.uint8)
                b.D[pe] = payloads[m]
        return [SYM_ADDED] * int(sbns.size)

    def num_missing(self, sbn: int) -> int:
        b = self._block(sbn)
        return b.K - b.nsrc

    def num_repair(self, sbn: int) -> int:
        return self._block(sbn).nrep

    def _repair_prepare(self, sbn: int):
        """Patched-system inputs for one block: (gaps, isis, overhead) or a
        terminal bool (True: nothing to repair, False: not enough repair)."""
        b = self._block(sbn)
        P = self.P
        gaps = np.nonzero(~b.got)[0].astype(np.int64)
        if gaps.size == 0:
            return True
        if b.nrep < gaps.size:
            return False
        overhead = b.nrep - gaps.size
        pad = P.Kp - b.K

        # patched system: gap LT slots take repair ISIs; overhead rows after
        # (reference patch_precode_matrix, nanorq.c:527-547)
        isis = np.arange(P.Kp + overhead, dtype=np.uint32)
        rep_isis = (b.rep_esis[: b.nrep] + pad).astype(np.uint32)
        isis[gaps] = rep_isis[: gaps.size]
        isis[P.Kp :] = rep_isis[gaps.size :]
        return gaps, isis, overhead

    def _repair_D(self, sbn: int, gaps: np.ndarray, overhead: int, M_pad: int) -> np.ndarray:
        """The patched payload matrix D [M_pad, T]: received sources in their
        rows, repair payloads in the gap and overhead slots (reference
        fill_symbol_matrix_gaps, nanorq.c:549-565).  M_pad is canonical given
        (K', overhead), so D can be staged before the pattern is solved."""
        b = self._block(sbn)
        P = self.P
        D = np.zeros((M_pad, self.scheme.T), np.uint8)
        if b.D is not None:
            have = np.nonzero(b.got)[0]
            D[have] = b.D[have]
        ng = gaps.size
        D[gaps] = b.rep_rows[:ng]
        D[P.Kp : P.Kp + overhead] = b.rep_rows[ng : ng + overhead]
        return D

    def _repair_launch_batch(self, items, mesh=None):
        """ONE stacked dispatch for same-(kind, M_pad) WSchedule blocks.

        items: [(sbn, gaps, overhead, plan, D_host|None)].  Returns
        [(sbn, gaps, view)] where each view lazily slices the shared device
        result (np.asarray on any view fetches the whole batch once).  A
        fresh-pattern decode at small K' is launch-overhead-bound —
        stacking turns nb uploads/dispatches/fetches into one of each —
        and the stacked block dim is the mesh-sharding axis (per-SBN
        independence, reference lib/nanorq.c:57).
        """
        import jax

        from nanorq_tpu.ops.wpath import (
            _w_gf2_batch_jit,
            _w_gf256_batch_jit,
            w_stack_gf2,
            w_stack_gf256,
        )

        from nanorq_tpu.utils import stats

        stats.count("repair_batch_launch")
        stats.count("repair_batch_blocks", len(items))
        plans = [p for _, _, _, p, _ in items]
        M_pad = plans[0].M_pad
        T = self.scheme.T
        nb = len(items)
        nb_pad = 1 << (nb - 1).bit_length() if nb > 1 else 1
        if mesh is not None:
            # shard axis must divide evenly into the mesh: round the padded
            # batch up to a MULTIPLE of the device count (a pow2 >= ndev is
            # not always divisible by a non-pow2 ndev, e.g. 4 blocks on 3
            # devices); zero-padded blocks are exact no-ops
            ndev = int(np.prod(mesh.devices.shape))
            nb_pad = -(-max(nb_pad, ndev) // ndev) * ndev
        D = np.zeros((nb_pad, M_pad, T), np.uint8)
        for j, (sbn, gaps, ov, _p, Dh) in enumerate(items):
            D[j] = Dh if Dh is not None else self._repair_D(sbn, gaps, ov, M_pad)

        def bpad(a, fill=0):
            if a.shape[0] == nb_pad:
                return a
            out = np.full((nb_pad,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        if plans[0].Wbits is not None:
            bits, rows = w_stack_gf2(plans)
            args = (bpad(bits), bpad(rows, M_pad - 1), D)
            fn = _w_gf2_batch_jit
        else:
            args = (bpad(w_stack_gf256(plans)), D)
            fn = _w_gf256_batch_jit
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            sh = NamedSharding(mesh, P(mesh.axis_names[0]))
            args = tuple(jax.device_put(a, sh) for a in args)
        res = _BatchResult(fn(*args))  # [nb_pad, m, T], async
        return [(it[0], it[1], _BatchView(res, j)) for j, it in enumerate(items)]

    def _repair_launch(self, sbn: int, gaps: np.ndarray, overhead: int, ds, D_dev=None):
        """Dispatch the block's device recovery (async).

        Two plan kinds (codec.cache.decoder_plan): a WSchedule runs ONE
        GF(2) matmul of the dense combination matrix over gathered payload
        rows (the small/mid-K' fast path, ops/wpath.py); a DeviceSchedule
        runs the structured replay + gap LT combine.

        D_dev: optionally a pre-staged device payload matrix [ds.M_pad, T]
        (benchmarks stage it to keep host->device transfer out of timed
        regions; production callers leave it None)."""
        import jax.numpy as jnp

        if D_dev is None:
            D_dev = jnp.asarray(self._repair_D(sbn, gaps, overhead, ds.M_pad))
        if isinstance(ds, _cache.WSchedule):
            return ds.apply(D_dev)  # rows 0..gaps-1 = gap symbols
        from nanorq_tpu.ops.lt import lt_combine, lt_plan
        from nanorq_tpu.ops.replay import device_arrays, replay_device

        C = replay_device(device_arrays(ds), D_dev)
        plan = lt_plan(gaps.astype(np.uint32), self.P)  # gap ESIs == ISIs (< K)
        return lt_combine(C, plan)  # lazy device value (async dispatch)

    def _repair_finish(self, io: IOContext, sbn: int, gaps: np.ndarray, sym) -> bool:
        b = self._block(sbn)
        if sym is not None:  # None: already written through (_out_row_ptrs)
            recovered = np.asarray(sym)[: gaps.size]
            self._write_symbols_coalesced(io, sbn, gaps, b.K, recovered)
        b.got[gaps] = True
        b.nsrc += gaps.size
        return self.num_missing(sbn) == 0

    def repair_block(self, io: IOContext, sbn: int) -> bool:
        """Recover the block's missing source symbols (nanorq_repair_block)."""
        prep = self._repair_prepare(sbn)
        if isinstance(prep, bool):
            return prep
        gaps, isis, overhead = prep
        ds = _cache.decoder_plan(self.P, isis, overhead)
        if ds is None:
            from nanorq_tpu.utils import stats

            stats.count("repair_block_failed")
            return False  # rank deficient: caller feeds more symbols, retries
        sym = self._repair_launch(sbn, gaps, overhead, ds)
        return self._repair_finish(io, sbn, gaps, sym)

    def _row_ptrs(self, sbn: int, gaps: np.ndarray, overhead: int, NB: int) -> np.ndarray:
        """Per-row payload addresses of the patched system's NB rows —
        the zero-copy analog of _repair_D for the native host arm: sources
        point into the ingestion matrix b.D, gap/overhead slots into the
        repair payloads, padding + constraint rows at a shared zero row.
        Every backing buffer is owned by self._blocks[sbn] (alive across
        the native call); the native side only READS through these."""
        b = self._block(sbn)
        T = self.scheme.T
        ptrs = np.full(NB, _zero_row(T).ctypes.data, np.uint64)
        if b.D is not None:
            have = np.nonzero(b.got)[0]
            ptrs[have] = np.uint64(b.D.ctypes.data) + have.astype(np.uint64) * np.uint64(
                b.D.strides[0]
            )
        ng = gaps.size
        rep0 = np.uint64(b.rep_rows.ctypes.data)
        rstride = np.uint64(b.rep_rows.strides[0])
        ptrs[gaps] = rep0 + np.arange(ng, dtype=np.uint64) * rstride
        Kp = self.P.Kp
        ptrs[Kp : Kp + overhead] = rep0 + np.arange(ng, ng + overhead, dtype=np.uint64) * rstride
        return ptrs

    def _out_row_ptrs(self, io: IOContext, sbn: int, gaps: np.ndarray) -> np.ndarray | None:
        """Per-gap output addresses straight into the decode object, or None
        when direct write-through doesn't apply (sub-blocked layout, non-
        buffer IO, or a clamped tail symbol).  Lets the native repair write
        recovered rows once, with no post-repair copy."""
        if self.scheme.N != 1:
            return None
        buf = getattr(io, "buffer", None)
        if buf is None or not io.writable or not buf.flags["C_CONTIGUOUS"] or buf.size < self.scheme.F:
            return None
        T = self.scheme.T
        base = symbol_ranges(self.scheme, sbn, 0, self._block(sbn).K)[0][0]
        offs = base + gaps.astype(np.uint64) * np.uint64(T)
        if gaps.size and int(offs[-1]) + T > self.scheme.F:  # short tail symbol
            return None
        return np.uint64(buf.ctypes.data) + offs

    def _repair_host_batch(self, work, io: IOContext | None = None):
        """CPU arm of the adaptive decode runtime: one native call fusing
        per-pattern system build + solve + substitution + LT gap combine for
        a batch of blocks (native.host_repair_shared — the reference's
        nanorq_repair_block shape, lib/nanorq.c:591-630, with zero device
        traffic and zero payload copies: the native call reads rows in place
        via _row_ptrs and, when the output object is a writable buffer,
        writes recovered rows straight into it via _out_row_ptrs).

        work: [(sbn, gaps, isis, overhead)].  Returns (ok, results) with
        results = [(sbn, gaps, recovered_np | None)] for successful blocks
        (None = already written through to io); rank-deficient blocks count
        as failures (feed more symbols, retry)."""
        from nanorq_tpu.native import host_repair_shared
        from nanorq_tpu.utils import stats

        P, T = self.P, self.scheme.T
        base = _cache._base_rows(P)
        Kp = P.Kp
        blocks, metas = [], []
        for sbn, gaps, isis, ov in work:
            ng = gaps.size
            rep_isis = np.empty(ng + ov, np.uint32)
            rep_isis[:ng] = isis[gaps]
            rep_isis[ng:] = isis[Kp : Kp + ov]
            orowp = None if io is None else self._out_row_ptrs(io, sbn, gaps)
            blocks.append((gaps, rep_isis, self._row_ptrs(sbn, gaps, ov, Kp + ov + P.S), orowp))
            metas.append((sbn, gaps))
        with stats.timer("host_repair"):
            res = host_repair_shared(P, base, blocks, T)
        if res is None:  # native library unavailable: caller reroutes
            return None
        outs, statuses = res
        stats.count("repair_host_blocks", len(blocks))
        ok, results = True, []
        for (sbn, gaps), (_, _, _, orowp), out, status in zip(metas, blocks, outs, statuses):
            if status == 0:
                results.append((sbn, gaps, None if orowp is not None else out))
            else:
                stats.count("decode_rank_deficient")
                stats.count("repair_block_failed")
                ok = False
        return ok, results

    def _repair_residual_host_batch(self, work, io: IOContext | None = None):
        """Solve-free CPU repair for small K' (native.host_residual):
        X = R (y ^ W D0) against the canonical factorization — the residual
        arm's math (see _repair_residual_batch) executed entirely on the
        host with zero device traffic and zero payload copies.  The per-
        block work is one axpy sweep over the received columns plus a tiny
        [g, nr] combine, so it beats the patched-system solve exactly where
        per-pattern solve overhead dominates (small K').

        work: [(sbn, gaps, isis, overhead)].  Returns like
        _repair_host_batch; None when the native factorization is
        unavailable (caller reroutes)."""
        from nanorq_tpu.native import host_residual_flat
        from nanorq_tpu.utils import stats

        P, T = self.P, self.scheme.T
        scheme = self.scheme
        kc = _cache.res_kcols(P)
        Kp = P.Kp
        nb = len(work)
        with stats.timer("res_prep"):
            # hoisted write-through eligibility (was per-block in
            # _out_row_ptrs): one buffer check for the whole batch
            buf_base = None
            if io is not None and scheme.N == 1:
                buf = getattr(io, "buffer", None)
                if (buf is not None and io.writable and buf.flags["C_CONTIGUOUS"]
                        and buf.size >= scheme.F):
                    buf_base = np.uint64(buf.ctypes.data)
            isi_list, gaps_list = [], []
            for sbn, gaps, isis, ov in work:
                ng = gaps.size
                rep_isis = np.empty(ng + ov, np.uint32)
                rep_isis[:ng] = isis[gaps]
                rep_isis[ng:] = isis[Kp : Kp + ov]
                isi_list.append(rep_isis)
                gaps_list.append(gaps)
            flat = _cache.res_wrows_flat(P, isi_list)
            if flat is None:
                return None  # no native factorization: caller reroutes
            W_all, _, nrs = flat
            ngaps = np.fromiter((g.size for g in gaps_list), np.int64, nb)
            gaps_all = (np.concatenate(gaps_list).astype(np.int32)
                        if nb else np.zeros(0, np.int32))
            gaps_off = np.zeros(nb, np.int64)
            if nb > 1:
                np.cumsum(ngaps[:-1], out=gaps_off[1:])
            d0p_all = np.zeros(nb * kc, np.uint64)
            yp_all = np.empty(int(nrs.sum()), np.uint64)
            orow_all = np.empty(int(ngaps.sum()), np.uint64)
            temps: list = [None] * nb
            yo = oo = 0
            for j, (sbn, gaps, isis, ov) in enumerate(work):
                ng, nr = gaps.size, int(nrs[j])
                b = self._block(sbn)
                if b.D is not None:
                    have = np.nonzero(b.got)[0]
                    d0p_all[j * kc + have] = np.uint64(b.D.ctypes.data) + have.astype(
                        np.uint64
                    ) * np.uint64(b.D.strides[0])
                yp_all[yo : yo + nr] = np.uint64(b.rep_rows.ctypes.data) + np.arange(
                    nr, dtype=np.uint64
                ) * np.uint64(b.rep_rows.strides[0])
                yo += nr
                op = None
                if buf_base is not None:
                    base = symbol_ranges(scheme, sbn, 0, b.K)[0][0]
                    offs = base + gaps.astype(np.uint64) * np.uint64(T)
                    if not (ng and int(offs[-1]) + T > scheme.F):  # short tail
                        op = buf_base + offs
                if op is None:
                    temps[j] = np.empty((ng, T), np.uint8)
                    op = np.uint64(temps[j].ctypes.data) + np.arange(
                        ng, dtype=np.uint64
                    ) * np.uint64(T)
                orow_all[oo : oo + ng] = op
                oo += ng
        with stats.timer("host_residual"):
            statuses = host_residual_flat(
                kc, T, nrs, ngaps, gaps_all, gaps_off, W_all, d0p_all, yp_all, orow_all
            )
        if statuses is None:
            return None
        stats.count("repair_res_host_blocks", nb)
        ok, results = True, []
        for j, (sbn, gaps, _, _) in enumerate(work):
            if statuses[j] == 0:
                results.append((sbn, gaps, temps[j]))
            else:
                stats.count("decode_rank_deficient")
                stats.count("repair_block_failed")
                ok = False
        return ok, results

    def _repair_residual_batch(self, work):
        """Residual arm of the adaptive decode runtime: repair WITHOUT a
        per-pattern system solve.

        Against the canonical (loss-independent, cached) factorization, a
        received repair symbol y_r = w_r . D where w_r is its canonical
        combination row (cache.res_wrows, memoized per ISI); splitting D
        into the received part D0 and the unknown gap rows X gives
        y = W D0 + G X with G = W[:, gaps] a tiny nr x g GF(256) system.
        The only per-pattern host work is G's left inverse R (native
        res_rinv, Gauss-Jordan on [G | I]); the device work is ONE batched
        fused dispatch X = R (y ^ W D0) (ops/wpath._res_batch_jit) whose
        shapes are quantized so one compiled program serves every pattern
        of a K'.  Rank-deficient G == the patched solve's rank deficiency:
        the block fails, the caller feeds more symbols and retries.

        work: [(sbn, gaps, isis, overhead)].  Returns (ok, launched) with
        launched = [(sbn, gaps, view)] (async device views), or None when
        the native factorization is unavailable (caller reroutes)."""
        import jax.numpy as jnp

        from nanorq_tpu.native import res_rinv
        from nanorq_tpu.ops.wpath import _res_batch_jit
        from nanorq_tpu.precode.device_schedule import _pad_rows
        from nanorq_tpu.utils import stats

        P, T = self.P, self.scheme.T
        kc = _cache.res_kcols(P)
        metas, Ws, Gs = [], [], []
        with stats.timer("res_prep"):
            for sbn, gaps, isis, ov in work:
                rep_isis = np.concatenate([isis[gaps], isis[P.Kp : P.Kp + ov]])
                W = _cache.res_wrows(P, rep_isis)
                if W is None:
                    return None  # no native factorization: caller reroutes
                metas.append((sbn, gaps, ov))
                Ws.append(W)
                Gs.append(np.ascontiguousarray(W[:, gaps]))
        with stats.timer("res_rinv"):
            rr = res_rinv(Gs)
        if rr is None:
            return None
        Rs, statuses = rr
        ok = True
        items = []
        for meta, W, R, status in zip(metas, Ws, Rs, statuses):
            if status == 0:
                items.append((meta, W, R))
            else:
                stats.count("decode_rank_deficient")
                stats.count("repair_block_failed")
                ok = False
        if not items:
            return ok, []
        stats.count("repair_res_blocks", len(items))

        launched = []
        for c0 in range(0, len(items), self._BATCH_FLUSH):
            chunk = items[c0 : c0 + self._BATCH_FLUSH]
            nb = len(chunk)
            nb_pad = 1 << (nb - 1).bit_length() if nb > 1 else 1
            nr_pad = _pad_rows(max(w.shape[0] for _, w, _ in chunk))
            g_pad = _pad_rows(max(m[1].size for m, _, _ in chunk))
            Wst = np.zeros((nb_pad, nr_pad, kc), np.uint8)
            Rst = np.zeros((nb_pad, g_pad, nr_pad), np.uint8)
            D0 = np.zeros((nb_pad, kc, T), np.uint8)
            yst = np.zeros((nb_pad, nr_pad, T), np.uint8)
            for j, ((sbn, gaps, ov), W, R) in enumerate(chunk):
                nr, g = W.shape[0], gaps.size
                Wst[j, :nr] = W
                Rst[j, :g, :nr] = R
                b = self._block(sbn)
                if b.D is not None:
                    n = min(b.D.shape[0], kc)
                    D0[j, :n] = b.D[:n]
                yst[j, :nr] = b.rep_rows[:nr]
            res = _BatchResult(_res_batch_jit(
                jnp.asarray(Wst), jnp.asarray(D0), jnp.asarray(Rst), jnp.asarray(yst)
            ))
            launched.extend(
                (m[0], m[1], _BatchView(res, j)) for j, (m, _, _) in enumerate(chunk)
            )
        return ok, launched

    # WSchedule blocks accumulate into stacked dispatches of up to this many
    # blocks (pow2-padded shapes bound compile diversity; chunking keeps
    # device work flowing while later solves run)
    _BATCH_FLUSH = 32

    def _repair_pipeline(self, max_workers: int | None = None, mesh=None, backend: str | None = None,
                         io: IOContext | None = None):
        """Solve + launch every gap block without draining results.

        Returns (ok_so_far, launched) where launched is a list of
        (sbn, gaps, device_symbols) with the device work already dispatched
        (JAX async dispatch); callers drain with _repair_finish.

        W-plan blocks (the small/mid-K' dense path) launch as STACKED
        batches — one upload/dispatch per _BATCH_FLUSH blocks, sharded over
        `mesh`'s first axis when given; structured plans launch per block.

        `backend` picks the execution arm per block (default env
        NANORQ_DECODE_BACKEND, else "auto"):
        - "auto": COLD patterns run on the host CPU arm (solve +
          substitution fused natively, no link traffic — the per-pattern
          plan build + upload only pays off when the compiled plan will be
          reused); patterns whose device plan is already cached replay on
          device.  A mesh forces the device arm (the host arm is
          single-node).
        - "res": the residual arm — no per-pattern system solve (canonical
          w-rows + a tiny native G-inverse + ONE batched device dispatch,
          _repair_residual_batch).  Explicit-only: it ships the received
          payloads to the device per pattern, which wins exactly when the
          host<->device link is fast (PCIe-attached TPU hosts), and loses
          on slow links; the auto policy therefore never picks it.  Falls
          back like "host" when the native factorization is unavailable.
        - "device": always build/replay device plans (the streaming shape).
        - "host": always the native CPU arm (falls back to device when the
          native library is unavailable).
        """
        import os as _os

        from concurrent.futures import ThreadPoolExecutor

        backend = backend or _os.environ.get("NANORQ_DECODE_BACKEND", "auto")
        work, ok = [], True
        for sbn in range(self.num_blocks):
            prep = self._repair_prepare(sbn)
            if isinstance(prep, bool):
                ok = ok and prep
            else:
                work.append((sbn, *prep))
        if not work:
            return ok, []

        if backend != "device" and mesh is None:
            from nanorq_tpu.native import native_available

            if native_available():
                res_work, rhost_work, host_work, dev_work = [], [], [], []
                if backend == "host":
                    host_work = work
                elif backend == "res":
                    res_work = work
                elif backend == "res_host":
                    rhost_work = work
                else:  # auto: warm plans -> device; cold patterns -> the
                    # solve-free residual arm at small K' (its nr x K' axpy
                    # sweep undercuts peel + double substitution there),
                    # the patched host solve above
                    small = self.P.Kp <= _RES_HOST_MAX
                    for item in work:
                        hit, plan = _cache.decoder_plan_cached(self.P, item[2], item[3])
                        if hit and plan is not None:
                            dev_work.append(item)
                        elif small:
                            rhost_work.append(item)
                        else:
                            host_work.append(item)
                launched = []
                if res_work:
                    rres = self._repair_residual_batch(res_work)
                    if rres is None:  # no native factorization: reroute
                        host_work = host_work + res_work
                    else:
                        rok, rlaunched = rres
                        ok = ok and rok
                        launched.extend(rlaunched)
                if rhost_work:
                    rres = self._repair_residual_host_batch(rhost_work, io)
                    if rres is None:  # no native factorization: reroute
                        host_work = host_work + rhost_work
                    else:
                        rok, results = rres
                        ok = ok and rok
                        launched.extend(results)
                if host_work:
                    res = self._repair_host_batch(host_work, io)
                    if res is None:
                        dev_work = work  # native vanished mid-flight: reroute all
                        launched = []
                    else:
                        hok, results = res
                        ok = ok and hok
                        launched.extend(results)
                if not dev_work:
                    return ok, launched
                work = dev_work
                dok, dlaunched = self._repair_pipeline_device(work, max_workers, mesh)
                return ok and dok, launched + dlaunched

        dok, launched = self._repair_pipeline_device(work, max_workers, mesh)
        return ok and dok, launched

    def _repair_pipeline_device(self, work, max_workers: int | None = None, mesh=None):
        """Device arm: per-pattern plans solved in a worker thread, device
        dispatches batched/stacked (see _repair_pipeline)."""
        from concurrent.futures import ThreadPoolExecutor

        ok = True

        # Producer-consumer pipeline: ONE solver thread streams pattern
        # solves; THIS thread owns the device queue (schedule upload + replay
        # dispatch), consuming solves in order — so solve(i+1) overlaps
        # upload/replay(i).  Both wider designs measured worse on real
        # hardware: N solver threads are memory-bandwidth-bound (8 solves on
        # a 4-wide pool ran 0.9x sequential), and pushing uploads/dispatches
        # into the workers convoys on the JAX client lock (0.4-0.7x serial).
        launched = []
        pend: dict[tuple, list] = {}

        def flush(key=None):
            for k in [key] if key is not None else list(pend):
                items = pend.pop(k, [])
                if not items:
                    continue
                if len(items) == 1 and mesh is None:
                    s, g, ov, ds, Dh = items[0]
                    launched.append((s, g, self._repair_launch(s, g, ov, ds, Dh)))
                else:
                    launched.extend(self._repair_launch_batch(items, mesh))

        with ThreadPoolExecutor(max_workers=max_workers or 1) as ex:
            futs = [
                (s, g, ov, ex.submit(_cache.decoder_plan, self.P, isis, ov))
                for s, g, isis, ov in work
            ]
            for sbn, gaps, ov, fut in futs:
                ds = fut.result()
                if ds is None:
                    from nanorq_tpu.utils import stats

                    stats.count("repair_block_failed")
                    ok = False
                    continue
                if isinstance(ds, _cache.WSchedule):
                    key = (ds.Wbits is not None, ds.M_pad)
                    pend.setdefault(key, []).append((sbn, gaps, ov, ds, None))
                    if len(pend[key]) >= self._BATCH_FLUSH:
                        flush(key)
                else:
                    launched.append((sbn, gaps, self._repair_launch(sbn, gaps, ov, ds)))
            flush()
        return ok, launched

    def repair_all(self, io: IOContext, max_workers: int | None = None, mesh=None,
                   backend: str | None = None) -> bool:
        """Repair every block through the adaptive runtime.

        Cold loss patterns run on the native CPU arm (solve + substitution
        fused, zero device traffic — _repair_host_batch); warm patterns
        replay their cached compiled plans on device, pipelined (SURVEY.md
        §7 hard-part 5): per-pattern host solves run in a worker thread
        while device replays dispatch as each solve lands, W-plan blocks
        stacked into batched dispatches.  Pass a jax.sharding.Mesh to shard
        those batches over its first axis (per-block independence needs no
        collectives; forces the device arm).  `backend` overrides the arm:
        "auto" (default, env NANORQ_DECODE_BACKEND) / "res" / "device" /
        "host".

        Returns True iff every block is fully recovered."""
        ok, launched = self._repair_pipeline(max_workers, mesh=mesh, backend=backend, io=io)
        for sbn, gaps, sym in launched:
            ok = self._repair_finish(io, sbn, gaps, sym) and ok
        return ok
