import cProfile, pstats, io, time, numpy as np
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.native import solve_native
from nanorq_tpu.precode.device_schedule import compile_device
P = params_init(56403)
rc = binary_rows(P)
st = solve_native(P, rc)
t0=time.time(); ds = compile_device(st, CB=256); print(f"compile_device: {time.time()-t0:.2f}s")
pr = cProfile.Profile(); pr.enable()
ds = compile_device(st, CB=256)
pr.disable()
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(10)
print("\n".join(s.getvalue().splitlines()[:18]))
