"""CLI decoder: data.rq -> output file (reference decode.c parity)."""

import argparse
import os
import struct
import sys

# persistent XLA cache: repeat CLI invocations skip device recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nanorq_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from nanorq_tpu.codec.api import SYM_ERR, Decoder
from nanorq_tpu.io.ioctx import FileIO


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="nanorq-decode")
    ap.add_argument("filename", help="output file to reconstruct into")
    ap.add_argument("-i", "--input", default="data.rq")
    args = ap.parse_args(argv)

    with open(args.input, "rb") as ih:
        oti_common, oti_scheme = struct.unpack("<QI", ih.read(12))
        dec = Decoder(oti_common, oti_scheme)
        T = dec.symbol_size
        with FileIO(args.filename, write=True, create_size=dec.transfer_length) as io:
            while True:
                hdr = ih.read(4)
                if len(hdr) < 4:
                    break
                (tag,) = struct.unpack("<I", hdr)
                packet = ih.read(T)
                if dec.add_symbol(packet, tag, io) == SYM_ERR:
                    print(f"adding symbol {tag} failed.", file=sys.stderr)
                    return 1
            for sbn in range(dec.num_blocks):
                print(
                    f"block {sbn} is {dec.block_symbols(sbn)} packets, "
                    f"lost {dec.num_missing(sbn)}, have {dec.num_repair(sbn)} repair"
                )
            # pipelined multi-block repair: host pattern-solves run in a
            # thread pool, overlapped with device replays (api.repair_all)
            ok = dec.repair_all(io)
            if not ok:
                for sbn in range(dec.num_blocks):
                    if dec.num_missing(sbn):
                        print(f"decode of sbn {sbn} failed.", file=sys.stderr)
            for sbn in range(dec.num_blocks):
                dec.cleanup(sbn)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
