import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
sys.path.insert(0, "/root/repo")
from pypic_tpu.presets import pic_iead

N_PER = 1_000_000 // 6
ITERS = 400
preset = pic_iead(n_per_species=N_PER)
cfg, st = preset.config, preset.state
step = preset.make_step()
n = st.p.shape[0]

def full(st):
    def body(i, s):
        s, _ = step(s)
        return s
    s = lax.fori_loop(0, ITERS, body, st)
    # keep EVERY leaf live so nothing is DCE'd out of the loop
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(s)
               if l.dtype != jnp.uint32)

f = jax.jit(full)
t0 = time.perf_counter(); r = f(st); float(r)
print(f"compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
t0 = time.perf_counter(); r = f(st); float(r)
el = (time.perf_counter()-t0)/ITERS*1e3
print(f"FULL STEP (all live): {el:.3f} ms/step  -> {n/el*1e3:.3e} pushes/s")
