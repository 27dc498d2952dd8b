#!/usr/bin/env python3
"""One-time generator for nanorq_tpu/rfc/_tabledata.py.

Extracts the RFC 6330 specification constants (not code) from the reference
checkout's C headers and packs them as base64 little-endian binary blobs:

- V0..V3: the four 256-entry uint32 tables of the spec PRNG (RFC 6330 §5.5,
  reference lib/rand.c:3-181)
- degree distribution f[0..30] (RFC 6330 §5.3.5.2, reference lib/tuple.c:4-8)
- Table 2: K_padded (477 entries), J(K'), (S, H, W) per K'
  (RFC 6330 §5.6, reference include/table2.h)

These are normative spec data; every RFC 6330 implementation embeds the same
numbers.  Run from the repo root:  python tools/gen_rfc_tables.py
"""

import base64
import re

import numpy as np

REF = "/root/reference"


def extract_ints(text: str) -> list[int]:
    return [int(x) for x in re.findall(r"\d+", text)]


def grab_array(src: str, name: str) -> list[int]:
    m = re.search(re.escape(name) + r"\[\][^=]*=\s*\{(.*?)\};", src, re.S)
    assert m, name
    return extract_ints(m.group(1))


def pack(arr, dtype) -> str:
    a = np.asarray(arr, dtype=dtype)
    return base64.b64encode(a.tobytes()).decode()


def main() -> None:
    rand_c = open(f"{REF}/lib/rand.c").read()
    tuple_c = open(f"{REF}/lib/tuple.c").read()
    table2_h = open(f"{REF}/include/table2.h").read()

    v = [grab_array(rand_c, f"V{i}") for i in range(4)]
    for t in v:
        assert len(t) == 256

    deg = grab_array(tuple_c, "degree_dist")
    assert len(deg) == 31 and deg[-1] == 1 << 20

    kp = grab_array(table2_h, "K_padded")
    jk = grab_array(table2_h, "J_K_padded")
    m = re.search(r"S_H_W\[\]\[3\]\s*=\s*\{(.*?)\};", table2_h, re.S)
    shw = extract_ints(m.group(1))
    assert len(kp) == len(jk) == 477 and len(shw) == 477 * 3
    assert kp[-1] == 56403

    out = [
        '"""Packed RFC 6330 specification constants (generated; see tools/gen_rfc_tables.py).',
        "",
        "Spec sources: PRNG tables V0..V3 (RFC 6330 s5.5), degree distribution",
        "(s5.3.5.2), systematic index Table 2: K', J(K'), S/H/W (s5.6).",
        '"""',
        "",
        "# fmt: off",
    ]
    for i in range(4):
        out.append(f"V{i}_B64 = \"{pack(v[i], '<u4')}\"")
    out.append(f"DEG_B64 = \"{pack(deg, '<u4')}\"")
    out.append(f"K_PADDED_B64 = \"{pack(kp, '<u2')}\"")
    out.append(f"J_K_B64 = \"{pack(jk, '<u2')}\"")
    out.append(f"S_H_W_B64 = \"{pack(shw, '<u2')}\"")
    out.append("# fmt: on")

    with open("nanorq_tpu/rfc/_tabledata.py", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote nanorq_tpu/rfc/_tabledata.py")


if __name__ == "__main__":
    main()
