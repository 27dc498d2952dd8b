import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.precode.solver import _solve_core, state_to_schedule
from nanorq_tpu.precode.matrix import binary_rows
from nanorq_tpu.precode.schedule import replay_numpy
from nanorq_tpu.precode.device_schedule import compile_device
from nanorq_tpu.ops.replay import device_arrays, replay_device
from nanorq_tpu.ops.lt import lt_plan, lt_combine

K = 1000
P = params_init(K)
st = _solve_core(P, binary_rows(P))
ds = compile_device(st, CB=256)
arr = device_arrays(ds)
T = 1280

# correctness check on device, small width
S = state_to_schedule(st)
rng = np.random.default_rng(0)
Dnp = np.zeros((ds.M_pad, 64), np.uint8); Dnp[:K] = rng.integers(0,256,(K,64),dtype=np.uint8)
C_dev = np.asarray(replay_device(arr, jnp.asarray(Dnp)))
C_ref = replay_numpy(Dnp[:S.n_rows].copy(), S)
print("TPU replay correct:", np.array_equal(C_dev, C_ref))

for B in (8, 32, 64, 128):
    Ds = []
    for v in range(4):
        D = np.zeros((ds.M_pad, B*T), np.uint8)
        D[:K] = rng.integers(0,256,(K,B*T),dtype=np.uint8)
        Ds.append(jnp.asarray(D))
    C = replay_device(arr, Ds[0]); C.block_until_ready()  # compile
    n = 12
    t0=time.time()
    outs=[]
    for it in range(n):
        outs.append(replay_device(arr, Ds[it % 4]))
    for o in outs: o.block_until_ready()
    t1=time.time()
    per=(t1-t0)/n
    payload=K*T*B
    isis = np.arange(P.Kp, dtype=np.uint32)
    plan = lt_plan(isis, P)
    Sy = lt_combine(outs[0], plan); Sy.block_until_ready()
    t2=time.time()
    ss=[]
    for it in range(n): ss.append(lt_combine(outs[it%4], plan))
    for o in ss: o.block_until_ready()
    t3=time.time()
    perlt=(t3-t2)/n
    print(f"B={B:4d}: replay {1e3*per:7.2f}ms = {8*payload/per/1e9:7.1f} Gbps | lt {1e3*perlt:7.2f}ms = {8*payload/perlt/1e9:7.1f} Gbps | both = {8*payload/(per+perlt)/1e9:7.1f} Gbps")
