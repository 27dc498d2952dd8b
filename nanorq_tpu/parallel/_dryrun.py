"""Self-provisioned virtual-mesh dryrun (subprocess entry point).

The driver calls ``__graft_entry__.dryrun_multichip(n)`` from a process
whose JAX is already initialized against the real single-chip backend, so
the n-device virtual CPU mesh must be provisioned in a fresh interpreter:
this module is executed as ``python -m nanorq_tpu.parallel._dryrun <n>``
with the env below set *before* JAX initializes (the same recipe as
tests/conftest.py; the env var alone is not enough on hosts whose
sitecustomize registers a TPU plugin at interpreter start, hence the config
update too).

The step it validates is the full sharded codec step (structured replay +
LT combine) over a 1-D 'blocks' mesh — the SPMD mapping described in
SURVEY.md §2/§7: independent source blocks data-parallel across devices,
schedule tensors replicated, no collectives on the hot path.  The reference
exposes this block independence at lib/nanorq.c:57 but never exploits it.
"""

import os
import sys


def _force_cpu_env(n_devices: int) -> dict:
    """Env that makes a fresh interpreter come up as an n-device CPU platform."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def run(n_devices: int, mode: str = "full") -> None:
    """Build + run the sharded codec step on an n-device mesh; assert bit-exact."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from nanorq_tpu.codec.cache import encoder_schedule
    from nanorq_tpu.ops.lt import lt_plan
    from nanorq_tpu.ops.replay import device_arrays
    from nanorq_tpu.parallel.mesh import codec_step_sharded, make_mesh, shard_width
    from nanorq_tpu.rfc.params import params_init

    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"virtual CPU mesh provisioning failed: need {n_devices} devices, "
            f"have {len(devs)} on backend {jax.default_backend()!r}"
        )
    from nanorq_tpu.codec.cache import decoder_schedule

    mesh = make_mesh(devs[:n_devices])

    rng_s = np.random.default_rng(3)
    if mode == "structured":
        # spawned with NANORQ_WPATH_MAX_KP=0: every pattern takes the
        # STRUCTURED replay plan, launched per block under the mesh — the
        # large-K' decode shape, validated here at toy size
        kinds = _public_roundtrip(
            mesh, rng_s, n_devices, Zb=n_devices, label="structured plans"
        )
        assert kinds == {"structured"}, f"expected structured plans, got {kinds}"
        return

    K, T, per_dev = 100, 128, 2
    blocks = n_devices * per_dev
    P = params_init(K)
    ds = encoder_schedule(P.Kp)
    arr = device_arrays(ds)
    ngaps = 5  # sources we will drop in the repair step below
    # encode plan covers K' systematic ISIs plus ngaps repair ISIs
    plan = lt_plan(np.arange(P.Kp + ngaps, dtype=np.uint32), P)
    rng = np.random.default_rng(0)
    D = np.zeros((ds.M_pad, blocks * T), np.uint8)
    D[:K] = rng.integers(0, 256, (K, blocks * T), dtype=np.uint8)

    Dsh = shard_width(D, mesh)
    C, sym = codec_step_sharded(arr, plan, Dsh, mesh)
    sym = np.asarray(sym)
    # systematic check: the sharded step must reproduce the source symbols
    assert np.array_equal(sym[:K], D[:K]), "sharded codec step lost bit-exactness"
    print(
        f"dryrun_multichip({n_devices}): encode OK — mesh {mesh.shape}, "
        f"{sym.shape} symbols, bit-exact"
    )

    # --- repair path (reference decode flow, lib/nanorq.c:591-630): drop
    # ngaps sources, splice their repair ISIs into the patched system, solve
    # the per-pattern schedule, and run the sharded replay + gap-LT step.
    gaps = np.asarray(sorted(rng.choice(K, size=ngaps, replace=False)), np.int64)
    isis = np.arange(P.Kp, dtype=np.uint32)
    isis[gaps] = P.Kp + np.arange(ngaps, dtype=np.uint32)  # repair ESI j -> ISI K'+j
    ds2 = decoder_schedule(P, isis, overhead=0)
    assert ds2 is not None, "patched-system solve unexpectedly rank deficient"
    D2 = np.zeros((ds2.M_pad, blocks * T), np.uint8)
    D2[:K] = D[:K]
    D2[gaps] = sym[P.Kp : P.Kp + ngaps]  # repair payloads in the gap slots
    gap_plan = lt_plan(gaps.astype(np.uint32), P)
    D2sh = shard_width(D2, mesh)
    _, rec = codec_step_sharded(device_arrays(ds2), gap_plan, D2sh, mesh)
    rec = np.asarray(rec)
    assert np.array_equal(rec[: gaps.size], D[gaps]), (
        "sharded repair step failed to recover dropped sources bit-exact"
    )
    print(
        f"dryrun_multichip({n_devices}): repair OK — {gaps.size} dropped sources "
        f"recovered bit-exact through the sharded patched-system step"
    )

    # --- dense-W decode path (ops/wpath.py), the production small-K' plan:
    # same pattern recovered via the sharded combination matmul
    from nanorq_tpu.codec.cache import WSchedule, decoder_plan
    from nanorq_tpu.parallel.mesh import w_step_sharded

    isw = np.arange(P.Kp + P.H + 4, dtype=np.uint32)  # >= H overhead: binary solve
    nrep2 = ngaps + P.H + 4
    isw[gaps] = (P.Kp + np.arange(ngaps)).astype(np.uint32)
    isw[P.Kp :] = (P.Kp + ngaps + np.arange(P.H + 4)).astype(np.uint32)
    plan_w = decoder_plan(P, isw, overhead=P.H + 4)
    assert isinstance(plan_w, WSchedule), "expected the dense-W plan at small K'"
    plan_all = lt_plan(np.arange(P.Kp + nrep2, dtype=np.uint32), P)
    _, sym2 = codec_step_sharded(arr, plan_all, Dsh, mesh)
    sym2 = np.asarray(sym2)
    D3 = np.zeros((plan_w.M_pad, blocks * T), np.uint8)
    D3[:K] = D[:K]
    D3[gaps] = sym2[P.Kp : P.Kp + ngaps]
    D3[P.Kp : P.Kp + P.H + 4] = sym2[P.Kp + ngaps : P.Kp + nrep2]
    rec2 = np.asarray(w_step_sharded(plan_w.staged(), shard_width(D3, mesh), mesh))
    assert np.array_equal(rec2[: gaps.size], D[gaps]), (
        "sharded dense-W decode failed to recover dropped sources bit-exact"
    )
    print(
        f"dryrun_multichip({n_devices}): dense-W decode OK — {gaps.size} gaps "
        f"recovered bit-exact via the sharded combination matmul"
    )

    # --- public-API round trip over the mesh: the PRODUCTION multi-chip
    # path.  Encoder (mesh-sharded replay + LT via encode_batch) feeds a
    # Decoder whose repair_all(mesh=...) shards the stacked per-block W
    # batches — one device dispatch repairing n_devices blocks, each with a
    # DISTINCT loss pattern.
    _public_roundtrip(mesh, rng, n_devices, Zb=n_devices, label="public API")

    # --- breadth gates: shapes production meets that the happy path above
    # does not cover.
    # (a) uneven blocks: Z not a multiple of the device count — the stacked
    #     W batch pads to a mesh-size multiple (codec/api.py nb_pad).
    _public_roundtrip(
        mesh, rng, n_devices, Zb=n_devices + 3, label=f"uneven Z={n_devices + 3}"
    )
    # (b) N>1 sub-block interleaving (the reference designs but disables
    #     this, lib/nanorq.c:78; we support it end to end) over the mesh.
    _public_roundtrip(mesh, rng, n_devices, Zb=n_devices, N=4, label="N=4 sub-blocks")
    # (c) mixed decode plans in ONE mesh repair_all: per-block overhead
    #     alternates above/below H, so the adaptive planner emits both
    #     binary-W (GF(2) stacked matmul) and HDPC GF(256)-W plans, stacked
    #     and sharded separately (codec/api.py pend key).
    kinds = _public_roundtrip(
        mesh, rng, n_devices, Zb=n_devices, ov_mode="mixed", label="mixed W plans"
    )
    assert kinds == {"W-gf2", "W-gf256"}, f"expected mixed plan kinds, got {kinds}"


def _public_roundtrip(mesh, rng, n_devices, Zb, N=1, ov_mode=None, label=""):
    """Encoder.encode_batch(mesh=) -> Decoder.repair_all(mesh=) round trip
    with a distinct loss pattern per block; returns the set of decode plan
    kinds the adaptive planner chose."""
    import numpy as np

    from nanorq_tpu.codec import cache as _cache
    from nanorq_tpu.codec.api import Decoder, Encoder
    from nanorq_tpu.codec.oti import make_tag
    from nanorq_tpu.io.ioctx import MemoryIO
    from nanorq_tpu.precode.device_schedule import DeviceSchedule

    Kb, Tb = 64, 96
    data = rng.integers(0, 256, Kb * Tb * Zb, dtype=np.uint8)
    enc = Encoder(data.size, Tb, Al=1, Z=Zb, N=N)
    assert enc.scheme.N == N
    src = MemoryIO(data)
    dec = Decoder(enc.oti_common(), enc.oti_scheme_specific())
    out = np.zeros(data.size, np.uint8)
    io = MemoryIO(out)
    H = enc.P.H
    for sbn in range(Zb):
        g = np.sort(rng.choice(Kb, size=3 + (sbn % 3), replace=False))
        keep = np.setdiff1d(np.arange(Kb), g)
        # mixed mode: even blocks get >= H overhead (binary factorization ->
        # GF(2) W), odd blocks get 1 (HDPC pivots -> GF(256) W)
        ov = (H + 4 if sbn % 2 == 0 else 1) if ov_mode == "mixed" else 2
        rep_esis = np.arange(Kb, Kb + g.size + ov)
        rep_pl = enc.encode_batch(sbn, rep_esis, src, mesh=mesh)
        # source payloads via the encoder's own reader: exact for N>1, where
        # symbol bytes interleave across sub-blocks (get_symbol_offset math)
        srcs = np.stack([enc._read_symbol(src, sbn, int(e), Kb) for e in keep])
        dec.add_symbols(srcs, [make_tag(sbn, int(e)) for e in keep], io)
        dec.add_symbols(rep_pl, [make_tag(sbn, int(e)) for e in rep_esis], io)
    # record which plan kinds the adaptive planner picks for these patterns
    kinds = set()
    for sbn in range(Zb):
        prep = dec._repair_prepare(sbn)
        if isinstance(prep, bool):
            continue
        plan = _cache.decoder_plan(dec.P, prep[1], prep[2])
        assert plan is not None, f"rank-deficient plan in dryrun block {sbn}"
        if isinstance(plan, DeviceSchedule):
            kinds.add("structured")
        else:
            kinds.add("W-gf2" if plan.Wbits is not None else "W-gf256")
    assert dec.repair_all(io, mesh=mesh), f"mesh repair_all failed [{label}]"
    assert np.array_equal(out, data), f"mesh round trip lost bit-exactness [{label}]"
    print(
        f"dryrun_multichip({n_devices}): {label} OK — {Zb} blocks, distinct loss "
        f"patterns, plans {sorted(kinds)}, bit-exact through "
        f"encode_batch(mesh=) + repair_all(mesh=)"
    )
    return kinds


def spawn(n_devices: int) -> None:
    """Run the dryrun in a fresh interpreter with a forced n-device CPU platform."""
    import subprocess

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = _force_cpu_env(n_devices)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # second pass: NANORQ_WPATH_MAX_KP=0 (snapshot at import) forces every
    # decode pattern onto the STRUCTURED plan, exercising per-block replay
    # launches under the mesh — the large-K' production shape
    env_structured = dict(env, NANORQ_WPATH_MAX_KP="0", NANORQ_WPATH_GF256_MAX_KP="0")
    for mode, e in (("full", env), ("structured", env_structured)):
        proc = subprocess.run(
            [sys.executable, "-m", "nanorq_tpu.parallel._dryrun", str(n_devices), mode],
            env=e,
            cwd=repo_root,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            raise RuntimeError(
                f"dryrun_multichip subprocess failed (rc={proc.returncode}, "
                f"mode={mode}):\n{proc.stderr[-2000:]}"
            )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # Re-assert the env in case we were launched directly without _force_cpu_env.
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ.update(_force_cpu_env(n))
    os.environ["JAX_PLATFORMS"] = "cpu"
    run(n, sys.argv[2] if len(sys.argv) > 2 else "full")
