import time, numpy as np, jax, jax.numpy as jnp
from nanorq_tpu.rfc.params import params_init
from nanorq_tpu.ops.lt import lt_plan, lt_combine
K, T, B, N = 1000, 1280, 32, 40
P = params_init(K)
rng = np.random.default_rng(0)
C0 = jnp.asarray(rng.integers(0,256,(P.L, B*T),dtype=np.uint8))
for ws in (8, 12, 16):
    plan = lt_plan(np.arange(P.Kp, dtype=np.uint32), P, w_small=ws)
    shapes = ([p.shape for p in []], )
    @jax.jit
    def loop(Cx, plan=plan):
        def body(i, Cc):
            s = lt_combine(Cc, plan)
            return Cc.at[:K].set(s[:K])
        return jax.lax.fori_loop(0, N, body, Cx)
    t0=time.time(); o=loop(C0); _=np.asarray(o[0,:4])
    t0=time.time(); o=loop(C0); _=np.asarray(o[0,:4]); per=(time.time()-t0-0.035)/N
    print(f"w_small={ws}: lt {1e3*per:.2f}ms -> {8*K*T*B/per/1e9:.1f} Gbps")
