import cProfile, pstats, io, time
import numpy as np
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.precode.solver import _solve_core
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.device_schedule import compile_device

K = 56403
P = params_init(K)
t0=time.time(); rc = binary_rows(P); print(f"rows build: {time.time()-t0:.2f}s")
t0=time.time(); st = _solve_core(P, rc); print(f"solve: {time.time()-t0:.2f}s")
t0=time.time(); ds = compile_device(st, CB=256); print(f"compile_device: {time.time()-t0:.2f}s (i={ds.i} u={ds.u})")
pr = cProfile.Profile(); pr.enable()
st = _solve_core(P, rc)
pr.disable()
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(12)
print("\n".join(s.getvalue().splitlines()[:22]))
