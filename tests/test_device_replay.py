"""JAX device replay + LT combine vs the NumPy oracles (virtual CPU mesh)."""

import numpy as np
import pytest

from nanorq_tpu.precode.device_schedule import compile_device, replay_structured_numpy
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.schedule import replay_numpy
from nanorq_tpu.precode.solver import _solve_core, state_to_schedule
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.rfc.tuples import lt_indices


def _system(K, ov, seed):
    rng = np.random.default_rng(seed)
    P = params_init(K)
    if ov:
        isis = np.arange(P.Kp + ov, dtype=np.uint32)
        gaps = rng.choice(K, size=min(ov, K), replace=False)
        isis[gaps] = np.arange(K, K + len(gaps)) + (P.Kp - K)
        isis[P.Kp :] = np.arange(K + len(gaps), K + len(gaps) + ov) + (P.Kp - K)
        rc = binary_rows(P, isis, overhead=ov)
    else:
        rc = binary_rows(P)
    st = _solve_core(P, rc, ov)
    assert st is not None
    return P, st, rng


@pytest.mark.parametrize("K,ov,CB", [(10, 0, 64), (100, 0, 64), (500, 0, 128), (500, 30, 128), (1000, 0, 256)])
def test_replay_device_matches_oracle(K, ov, CB):
    import jax.numpy as jnp

    from nanorq_tpu.ops.replay import device_arrays, replay_device

    P, st, rng = _system(K, ov, K + ov)
    S = state_to_schedule(st)
    ds = compile_device(st, CB=CB)
    T = 32
    D = np.zeros((max(S.n_rows, ds.M_pad), T), np.uint8)
    D[:K] = rng.integers(0, 256, (K, T), dtype=np.uint8)
    C_ref = replay_numpy(D[: S.n_rows], S)
    C_np = replay_structured_numpy(D, ds)
    assert np.array_equal(C_np, C_ref)
    arr = device_arrays(ds)
    C_dev = np.asarray(replay_device(arr, jnp.asarray(D[: ds.M_pad])))
    assert np.array_equal(C_dev, C_ref)


@pytest.mark.parametrize("K", [10, 100, 1000])
def test_lt_combine_systematic(K):
    import jax.numpy as jnp

    from nanorq_tpu.ops.lt import lt_combine, lt_plan
    from nanorq_tpu.ops.replay import device_arrays, replay_device
    from nanorq_tpu.precode.solver import solve_encoder

    P = params_init(K)
    rng = np.random.default_rng(K)
    st = _solve_core(P, binary_rows(P), 0)
    ds = compile_device(st)
    T = 16
    D = np.zeros((ds.M_pad, T), np.uint8)
    src = rng.integers(0, 256, (K, T), dtype=np.uint8)
    D[:K] = src
    C = replay_device(device_arrays(ds), jnp.asarray(D))

    # systematic symbols reproduce source; repair symbols match numpy LT
    esis = np.concatenate([np.arange(K), np.arange(K, K + 7)])
    isis = esis + (P.Kp - K) * (esis >= K)
    plan = lt_plan(isis.astype(np.uint32), P)
    sym = np.asarray(lt_combine(C, plan))
    assert np.array_equal(sym[:K], src)

    Cnp = np.asarray(C)
    idx, valid = lt_indices(isis.astype(np.uint32), P)
    for r in range(K, len(esis)):
        want = np.zeros(T, np.uint8)
        for c in idx[r][valid[r]]:
            want ^= Cnp[c]
        assert np.array_equal(sym[r], want)


@pytest.mark.parametrize("K", [100, 1000, 5000])
def test_lt_plan_sorted_matches_flat(K):
    """The degree-sorted class layout is a pure re-planning: identical output
    to the flat row-aligned plan for arbitrary ISI batches."""
    import jax.numpy as jnp

    from nanorq_tpu.ops.lt import lt_combine, lt_plan

    P = params_init(K)
    rng = np.random.default_rng(3 * K)
    C = jnp.asarray(rng.integers(0, 256, (P.L, 64), dtype=np.uint8))
    isis = np.r_[
        rng.choice(P.Kp, size=K // 2, replace=False),
        np.arange(P.Kp, P.Kp + 9),
    ].astype(np.uint32)
    a = np.asarray(lt_combine(C, lt_plan(isis, P, mode="flat")))[: isis.size]
    b = np.asarray(lt_combine(C, lt_plan(isis, P, mode="sorted")))[: isis.size]
    assert np.array_equal(a, b)


@pytest.mark.parametrize("K,ov", [(500, 0), (1000, 0), (5000, 137), (5000, 0)])
def test_wut_identity(K, ov):
    """Wut = T^-1 U_t exactly: applying T's rows (unit diagonal + dep edges)
    to Wut must reproduce the sparse U_t entries, bit for bit.  Covers the
    native forward substitution and the posmap basis change."""
    from nanorq_tpu.precode.solver import solve_state

    rng = np.random.default_rng(7 * K + ov)
    P = params_init(K)
    if ov:
        isis = np.arange(P.Kp + ov, dtype=np.uint32)
        gaps = rng.choice(K, size=min(ov, K), replace=False)
        isis[gaps] = np.arange(K, K + len(gaps)) + (P.Kp - K)
        isis[P.Kp :] = np.arange(K + len(gaps), K + len(gaps) + ov) + (P.Kp - K)
        rc = binary_rows(P, isis, overhead=ov)
    else:
        rc = binary_rows(P)
    st = solve_state(P, rc, ov)
    assert st is not None
    ds = compile_device(st)
    if getattr(st, "tri_edges", None) is None:
        pytest.skip("native factorization artifacts unavailable")
    dep_k, dep_pos = st.tri_edges
    ut_k, ut_uc = st.ut_edges
    i = st.i
    # back to position basis: x[k] = wut row at device position posmap[k];
    # reconstruct posmap from out_sel (position of pivot col c = out_sel[c])
    pos_of = np.asarray(ds.out_sel, np.int64)
    x = np.asarray(ds.wut)[pos_of[st.piv_cols]]
    chk = x.copy()
    np.bitwise_xor.at(chk, dep_k, x[dep_pos])
    ut = np.zeros((max(i, 1), ds.u_pad // 8), np.uint8)
    np.bitwise_or.at(ut, (ut_k, ut_uc >> 3), (np.uint8(1) << (ut_uc & 7).astype(np.uint8)))
    assert np.array_equal(chk, ut)


def test_gather_plan_covers_beyond_grid_degrees():
    """A row wider than the width grid (4096) must still land every dep in
    the plan (review r3: the rewritten class loop silently dropped such
    rows; the tri planner asserts, the gather plan must not lose edges)."""
    import numpy as np

    from nanorq_tpu.precode.device_schedule import GatherPlan, _gather_plan_flat

    n_rows, big = 16, 5000
    erows = np.concatenate([np.zeros(big, np.int64), np.full(7, 3, np.int64)])
    edeps = np.arange(erows.size, dtype=np.int64)
    plan = _gather_plan_flat(n_rows, erows, edeps, sentinel=10**6)
    placed = sum(int((np.asarray(p) != 10**6).sum()) for p in plan.passes)
    placed += sum(int((np.asarray(ix) != 10**6).sum()) for ix, _ in plan.overflow)
    assert placed == erows.size, f"{placed} of {erows.size} edges placed"
