"""Decompose the sheath bench row (1e6, ng=51, PIC_L_DD workload) on v5e.

Measures: full step at several maxiter caps (marginal per-Picard-iteration
cost + intercept), the re-injection RNG block standalone, and one fused
Picard pass standalone — to attribute the ~1.6 ms/step to sweeps vs glue.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from pypic_tpu.constants import K_BOLTZMANN
from pypic_tpu.grid import GridSpec
from pypic_tpu import initialize as init
from pypic_tpu.engines import sheath
from pypic_tpu.runner import run

STEPS = 200
n, ng = 1_000_000, 51
density, dt, dx = 1e19, 1e-12, 1e-5
te = ti = 10.0 * 11600.0
length = dx * (ng - 1)
grid = GridSpec(ng, length, "dirichlet-dirichlet")
d = init.initialize_sheath(n, density, 1.0, 0.0, grid, te, ti, seed=3)


def timed(go):
    go()
    t0 = time.perf_counter()
    go()
    return (time.perf_counter() - t0) / STEPS * 1e3


def full(maxiter=20, accel="anderson", init_mode="extrapolate"):
    cfg = sheath.SheathConfig(
        grid, dt, length * density / n,
        kbte=K_BOLTZMANN * te, kbti=K_BOLTZMANN * ti,
        picard_init=init_mode, picard_accel=accel, maxiter=maxiter,
    )
    st = sheath.init_state(d["x"], d["v"], d["q"], d["m"], d["species"], cfg)
    step = sheath.make_step(cfg)

    def go():
        _, m = run(step, st, STEPS)
        np.asarray(m.field_energy)
        return m

    ms = timed(go)
    _, m = run(step, st, STEPS)
    it = float(np.asarray(m.picard_iters).mean())
    print(f"full maxiter={maxiter} accel={accel}: {ms:.3f} ms/step "
          f"(picard mean {it:.1f})", flush=True)
    return ms, it


for mi in (20, 6, 4, 1):
    full(maxiter=mi)
full(maxiter=20, accel="none")

# --- re-injection RNG block standalone (the step's unconditional sampling)
p0 = jnp.asarray(d["x"] / dx, jnp.float32)
m_arr = jnp.asarray(d["m"], jnp.float32)
species = jnp.asarray(d["species"], jnp.int32)
kbte, kbti = K_BOLTZMANN * te, K_BOLTZMANN * ti
cells = float(ng - 1)


@jax.jit
def rng_block(key):
    def one(key, _):
        key, k_x, k_v = jax.random.split(key, 3)
        x_new = jax.random.uniform(k_x, p0.shape, p0.dtype, 0.0, cells)
        kbt_per = jnp.where(species == 1, kbte, kbti)
        v_new = (jax.random.normal(k_v, p0.shape + (3,), p0.dtype)
                 * jnp.sqrt(kbt_per / m_arr)[:, None])
        return key, (jnp.sum(x_new), jnp.sum(v_new))

    key, outs = jax.lax.scan(one, key, None, length=STEPS)
    return outs


out = rng_block(jax.random.PRNGKey(0))
jax.tree.map(np.asarray, out)
t0 = time.perf_counter()
out = rng_block(jax.random.PRNGKey(1))
jax.tree.map(np.asarray, out)
print(f"reinjection RNG block: {(time.perf_counter() - t0) / STEPS * 1e3:.3f}"
      " ms/step", flush=True)

# --- one fused Picard pass standalone (amortized inside one dispatch)
from pypic_tpu.ops.pallas_cic import sheath_picard_pallas

es = jnp.zeros((ng,), jnp.float32)
u0 = jnp.asarray(d["v"][:, 0], jnp.float32)
q = jnp.asarray(d["q"], jnp.float32)
act = jnp.ones((n,), jnp.float32)
w = q * ((length * density / n) / dx)
qm = q / m_arr


@jax.jit
def pass_loop(es, ps):
    def one(carry, _):
        es, ps = carry
        xh, act1, jh = sheath_picard_pallas(
            es, ps, p0, u0, qm, w, act, dt=dt, dx=dx,
            wall_ratio=dx * dx / dt,
        )
        return (es + 1e-30 * jh, xh), None

    (es, ps), _ = jax.lax.scan(one, (es, ps), None, length=STEPS)
    return es, ps


r = pass_loop(es, p0)
jax.tree.map(np.asarray, r)
t0 = time.perf_counter()
r = pass_loop(es, p0)
jax.tree.map(np.asarray, r)
print(f"fused picard pass standalone: "
      f"{(time.perf_counter() - t0) / STEPS * 1e3:.3f} ms/pass", flush=True)
