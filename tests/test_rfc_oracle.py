"""Bit-exactness of rand/tuple/params/LT-expansion vs the reference C code.

Compiles the reference's own lib/{rand,tuple,params}.c (in place, from
/root/reference) into a golden-vector generator and diffs our vectorized
NumPy implementations against it.  Skipped if no reference tree or compiler
is available.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference"
HERE = os.path.dirname(__file__)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if not os.path.isdir(REF) or shutil.which("cc") is None:
        pytest.skip("reference tree or compiler unavailable")
    tmp = tmp_path_factory.mktemp("oracle")
    exe = tmp / "oracle"
    cmd = [
        "cc", "-O1", "-o", str(exe),
        os.path.join(HERE, "oracle", "main.c"),
        f"{REF}/lib/rand.c", f"{REF}/lib/tuple.c", f"{REF}/lib/params.c",
        "-I", os.path.join(HERE, "oracle"),  # octmat.h stub first
        "-I", f"{REF}/include",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"oracle compile failed: {r.stderr[:500]}")

    def run(K, nX=64):
        out = subprocess.run([str(exe), str(K), str(nX)], capture_output=True, text=True, check=True)
        return out.stdout.splitlines()

    return run


K_SAMPLES = [1, 10, 11, 100, 500, 1000, 5000, 10000, 56403]


@pytest.mark.parametrize("K", K_SAMPLES)
def test_params_tuples_idxs(oracle, K):
    from nanorq_tpu.rfc.params import params_init
    from nanorq_tpu.rfc.tuples import gen_tuples, lt_indices

    lines = oracle(K, 64)
    P = params_init(K)
    head = lines[0].split()
    assert head[0] == "P"
    assert [int(x) for x in head[1:]] == [P.Kp, P.J, P.S, P.H, P.W, P.L, P.P, P.P1, P.U, P.B]

    X = np.arange(64, dtype=np.uint32)
    t = gen_tuples(X, P)
    idx, valid = lt_indices(X, P)
    for ln in lines[1:]:
        f = ln.split()
        if f[0] == "T":
            x = int(f[1])
            got = (int(t.d[x]), int(t.a[x]), int(t.b[x]), int(t.d1[x]), int(t.a1[x]), int(t.b1[x]))
            assert got == tuple(int(v) for v in f[2:]), f"K={K} X={x}"
        elif f[0] == "I":
            x = int(f[1])
            want = [int(v) for v in f[2:]]
            got = list(idx[x][valid[x]])
            # reference pushes LT neighbors then PI neighbors, same as ours
            assert got == want, f"K={K} X={x}: {got} != {want}"


def test_rand_probes(oracle):
    from nanorq_tpu.rfc.rand import rnd_get

    for ln in oracle(10, 1):
        f = ln.split()
        if f[0] == "R":
            y, i, want = int(f[1]), int(f[2]), int(f[3])
            assert rnd_get(np.uint32(y), i, 1 << 20) == want
