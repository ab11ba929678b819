"""int8 selector one-hot A/B (PERF.md item 4's last unproven lever /
VERDICT round-3 item 6): time the fused Picard iteration pass at 1e8 with
the window one-hot built via the i32 compare + f32 cast chain (current)
vs an int8 compare + i8->f32 convert (_SEL_VIA_INT8).

Run on TPU: python scratch/sel_int8_ab.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pypic_tpu.ops import pallas_cic as pc

n = 6104 * 16384  # block-aligned 1e8 (the bench headline n)
ng = 200
rng = np.random.default_rng(0)
p = jnp.asarray(rng.uniform(0, ng, n), jnp.float32)
v = jnp.asarray(rng.normal(0, 1.0, n), jnp.float32)
field = jnp.asarray(rng.normal(0, 1.0, ng), jnp.float32)

(p_b, v_b), _ = pc.block_particles([p, v])


def timeit(label):
    # fresh jit wrapper per variant: the module flag is read at trace time
    @jax.jit
    def run(f, pb, vb):
        return pc.picard_iteration_pallas(
            f, pb, pb, vb, ng,
            qm=-1.76e11, w=1e-7, dt=1e-5, dx=1.0, emit_v=False, n_valid=n,
            share_window=False,
        )

    def go():
        outs = run(field, p_b, v_b)
        np.asarray(outs[-1])  # jh to host

    t0 = time.perf_counter()
    go()
    print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        go()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: best {best*1e3:8.2f} ms/pass "
          f"({best/n*1e9:.4f} ns/particle)", flush=True)
    return best


b0 = timeit("f32-selector")
pc._SEL_VIA_INT8 = True
b1 = timeit("int8-selector")
print(f"int8/f32 ratio: {b1/b0:.3f}", flush=True)
