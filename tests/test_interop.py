"""Cross-implementation wire interop against the REAL reference binaries.

The reference's oblas dependency is an empty submodule, so the reference
encode/decode could never be built before; tests/interop/oblas_shim/ is a
scalar stand-in (~150 LoC, written from call sites — see its headers) that
lets the actual reference C sources compile and run.  These tests close the
conformance loop SURVEY.md §4(d) calls for:

  1. the reference `encode` produces a data.rq stream (encode.c:87-94 wire
     format) that OUR decoder reconstructs bit-exact;
  2. OUR encoder produces a stream the reference `decode` (decode.c:13-65)
     reconstructs bit-exact;
  3. every pinned golden-corpus stream (tests/golden/, produced by our
     encoder) decodes bit-exact under the reference binary — so the corpus
     hashes carry cross-implementation conformance, not just self-pinning
     (advisor r4).
"""

import hashlib
import json
import os
import shutil
import subprocess
import sys
import glob

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"
SHIM = os.path.join(HERE, "interop", "oblas_shim")


@pytest.fixture(scope="session")
def ref_bins(tmp_path_factory):
    """Compile the reference encode/decode with the oblas shim (in a temp
    dir; /root/reference itself is never written)."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    tmp = tmp_path_factory.mktemp("refbuild")
    srcs = sorted(glob.glob(os.path.join(REF, "lib", "*.c")))
    srcs.append(os.path.join(SHIM, "oblas_shim.c"))
    flags = [
        "-O2", "-std=c99", "-D_DEFAULT_SOURCE", "-D_FILE_OFFSET_BITS=64",
        "-I", REF, "-I", os.path.join(REF, "include"), "-I", SHIM,
    ]
    bins = {}
    for tool in ("encode", "decode"):
        exe = tmp / f"ref_{tool}"
        r = subprocess.run(
            ["gcc", *flags, *srcs, os.path.join(REF, f"{tool}.c"), "-o", str(exe)],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"reference {tool} compile failed: {r.stderr[:500]}")
        bins[tool] = str(exe)
    return bins


def _run_our_cli(mod, args, cwd):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(HERE))
    r = subprocess.run(
        [sys.executable, "-m", f"nanorq_tpu.cli.{mod}", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=600,
    )
    assert r.returncode == 0, f"our {mod} failed: {r.stderr[-800:]}"
    return r


def test_reference_encode_our_decode(ref_bins, tmp_path):
    """data.rq produced by the REFERENCE binary reconstructs bit-exact
    through our decoder (reference wire format, encode.c:87-94)."""
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    (tmp_path / "input.bin").write_bytes(data)
    r = subprocess.run(
        [ref_bins["encode"], "input.bin", "1280"],
        capture_output=True, cwd=tmp_path, timeout=300,
    )
    assert r.returncode == 0 and (tmp_path / "data.rq").exists()
    _run_our_cli("decode", ["-i", "data.rq", "out.bin"], tmp_path)
    assert (tmp_path / "out.bin").read_bytes() == data


def test_our_encode_reference_decode(ref_bins, tmp_path):
    """Our encoder's data.rq (with simulated loss + overhead) reconstructs
    bit-exact through the REFERENCE decode binary."""
    rng = np.random.default_rng(43)
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    (tmp_path / "input.bin").write_bytes(data)
    _run_our_cli(
        "encode",
        ["input.bin", "1280", "-o", "data.rq", "--loss", "6", "--overhead", "5", "--seed", "11"],
        tmp_path,
    )
    r = subprocess.run(
        [ref_bins["decode"], "out.bin"], capture_output=True, cwd=tmp_path, timeout=300
    )
    assert r.returncode == 0, r.stdout[-500:]
    assert b"failed" not in r.stdout
    assert (tmp_path / "out.bin").read_bytes() == data


def test_golden_corpus_reference_decodes(ref_bins, tmp_path):
    """Every pinned golden stream decodes bit-exact under the reference
    binary: the corpus hashes carry cross-implementation conformance."""
    man = json.load(open(os.path.join(HERE, "golden", "manifest.json")))
    for name, m in man.items():
        if name.startswith("_"):  # manifest metadata, not a config
            continue
        shutil.copy(os.path.join(HERE, "golden", f"{name}.rq"), tmp_path / "data.rq")
        out = tmp_path / "gout.bin"
        if out.exists():
            out.unlink()
        r = subprocess.run(
            [ref_bins["decode"], "gout.bin"], capture_output=True, cwd=tmp_path, timeout=300
        )
        assert r.returncode == 0, f"{name}: reference decode rc={r.returncode}"
        assert b"failed" not in r.stdout, f"{name}: {r.stdout[-300:]}"
        got = out.read_bytes()
        assert len(got) == m["F"], f"{name}: size {len(got)} != F {m['F']}"
        assert hashlib.sha256(got).hexdigest() == m["sha256_data"], (
            f"{name}: reference-decoded bytes mismatch the pinned sha256_data"
        )
