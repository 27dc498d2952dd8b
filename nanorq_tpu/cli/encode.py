"""CLI encoder: file -> data.rq packet stream (reference encode.c parity).

Wire format (encode.c:87-94): little-endian u64 oti_common, u32 oti_scheme,
then (u32 tag, T-byte payload) records.  Simulates 6% random source-packet
drop and emits dropped+5 repair symbols per block, like the reference
(encode.c:28-44).
"""

import argparse
import random
import struct
import sys

import numpy as np

from nanorq_tpu.codec.api import Encoder
from nanorq_tpu.codec.oti import make_tag
from nanorq_tpu.io.ioctx import FileIO


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nanorq-encode")
    ap.add_argument("filename")
    ap.add_argument("packet_size", type=int)
    ap.add_argument("-o", "--output", default="data.rq")
    ap.add_argument("--loss", type=float, default=6.0, help="simulated drop %%")
    ap.add_argument("--overhead", type=int, default=5, help="extra repair per block")
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args(argv)

    rng = random.Random(args.seed)
    with FileIO(args.filename) as io:
        filesize = io.size()
        enc = Encoder(filesize, args.packet_size, Al=8)
        with open(args.output, "wb") as oh:
            oh.write(struct.pack("<QI", enc.oti_common(), enc.oti_scheme_specific()))
            for sbn in range(enc.num_blocks):
                num_esi = enc.block_symbols(sbn)
                kept = [e for e in range(num_esi) if rng.random() * 100.0 >= args.loss]
                dropped = num_esi - len(kept)
                repair = list(range(num_esi, num_esi + dropped + args.overhead))
                payloads = enc.encode_batch(sbn, np.array(kept + repair), io)
                for esi, payload in zip(kept + repair, payloads):
                    oh.write(struct.pack("<I", make_tag(sbn, esi)))
                    oh.write(payload.tobytes())
                enc.cleanup(sbn)
                print(
                    f"block {sbn} is {num_esi} packets, dropped {dropped}, "
                    f"created {len(repair)} repair",
                    file=sys.stdout,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
