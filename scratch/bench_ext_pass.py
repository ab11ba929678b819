"""Standalone fused Picard pass cost: periodic vs extended-slab at 1e8.

Quantifies the domain engine's per-iteration overhead vs the headline
(ext kernel reads an extra per-particle w array and clamps twice)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from pypic_tpu.ops import pallas_cic as pc

N = 100_000_000
NG = 200
HW = 13
EXT = NG + 2 * HW + 1

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 3)
ps = jax.random.uniform(ks[0], (N,), jnp.float32, 0.0, float(NG))
v0 = jax.random.normal(ks[1], (N,), jnp.float32) * 1e5
f_per = jax.random.normal(ks[2], (NG,), jnp.float32)
f_ext = jax.random.normal(ks[2], (EXT,), jnp.float32)
w = jnp.full((N,), 1e-6, jnp.float32)
ps_s = ps * ((NG - 1 + 2.0) / NG) + 2.0  # shifted into ext coords


@jax.jit
def many_periodic(field, ps, p0, v0):
    def body(i, carry):
        ph, acc = carry
        ph2, jh = pc.picard_iteration_pallas(
            field, ph, p0, v0, NG, qm=jnp.float32(-1.76e11),
            w=jnp.float32(1e-6), dt=1e-5, dx=1e-3)
        return ph2, acc + jh[0]
    _, acc = jax.lax.fori_loop(0, 20, body, (ps, jnp.float32(0)))
    return acc


@jax.jit
def many_ext(field, ps, p0, v0, w):
    def body(i, carry):
        ph, acc = carry
        ph2, jh = pc.picard_iteration_ext_pallas(
            field, ph, p0, v0, w, EXT, qm=jnp.float32(-1.76e11),
            dt=1e-5, dx=1e-3, lo=2.0, hi=float(EXT - 2))
        return ph2, acc + jh[0]
    _, acc = jax.lax.fori_loop(0, 20, body, (ps, jnp.float32(0)))
    return acc


for name, fn, args in (
    ("periodic", many_periodic, (f_per, ps, ps, v0)),
    ("ext-slab", many_ext, (f_ext, ps_s, ps_s, v0, w)),
):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    el = time.perf_counter() - t0
    print(f"{name}: {el/20*1e3:.2f} ms/pass ({el/20/N*1e9:.3f} ns/particle)",
          flush=True)
