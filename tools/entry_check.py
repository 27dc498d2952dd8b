import importlib.util, time, numpy as np, jax
spec = importlib.util.spec_from_file_location("ge", "__graft_entry__.py")
ge = importlib.util.module_from_spec(spec); spec.loader.exec_module(ge)
t0 = time.time()
fn, args = ge.entry()
out = jax.jit(fn)(*args)
v = np.asarray(out[0, :4])
print(f"entry OK on {jax.devices()[0]}: out {out.shape} in {time.time()-t0:.0f}s")
