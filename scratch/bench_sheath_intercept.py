"""Decompose the sheath step INTERCEPT (maxiter=1 cost, 1e6/ng=51, v5e).

The marginal Picard pass is ~0.07 ms; the reference-tolerance row is
intercept-bound. Measures: hash vs threefry full step at maxiter=1, the
hash re-injection block standalone, the block/unblock copies standalone.
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


def full(maxiter, sampler):
    cfg = sheath.SheathConfig(
        grid, dt, length * density / n,
        kbte=K_BOLTZMANN * te, kbti=K_BOLTZMANN * ti,
        picard_init="extrapolate", picard_accel="anderson",
        maxiter=maxiter, rng_sampler=sampler,
    )
    st = sheath.init_state(d["x"], d["v"], d["q"], d["m"], d["species"], cfg)
    step = sheath.make_step(cfg)

    def go():
        _, m = run(step, st, STEPS)
        np.asarray(m.field_energy)

    ms = timed(go)
    print(f"full maxiter={maxiter} sampler={sampler}: {ms:.3f} ms/step",
          flush=True)
    return ms


for sampler in ("hash", "threefry"):
    full(1, sampler)
full(20, "hash")

# --- hash re-injection block standalone (what the step does per step)
from pypic_tpu.sources import hash_normals, hash_uniforms

p0 = jnp.asarray(d["x"] / dx, jnp.float32)
v0 = jnp.asarray(d["v"], jnp.float32)
m_arr = jnp.asarray(d["m"], jnp.float32)
species = jnp.asarray(d["species"], jnp.int32)
lost = jnp.zeros((n,), bool).at[:1000].set(True)
kbte, kbti = K_BOLTZMANN * te, K_BOLTZMANN * ti
cells = float(ng - 1)


@jax.jit
def hash_block(seed0):
    def one(c, i):
        s = seed0 + i.astype(jnp.uint32)
        x_new = hash_uniforms(s, n, 1)[0] * jnp.float32(cells)
        z = hash_normals(s + jnp.uint32(7), n, 2)
        v_new = (jnp.stack([z[0], z[1], z[2]], axis=-1)
                 * jnp.sqrt(jnp.where(species == 1, kbte, kbti)
                            / m_arr)[:, None])
        p1 = jnp.where(lost, x_new, c[0])
        v1 = jnp.where(lost[:, None], v_new, c[1])
        return (p1, v1), None

    c, _ = jax.lax.scan(one, (p0, v0), jnp.arange(STEPS, dtype=jnp.uint32))
    return c


r = hash_block(jnp.uint32(1))
jax.tree.map(np.asarray, r)
t0 = time.perf_counter()
r = hash_block(jnp.uint32(2))
jax.tree.map(np.asarray, r)
print(f"hash reinjection block: {(time.perf_counter()-t0)/STEPS*1e3:.3f}"
      " ms/step", flush=True)

# --- block/unblock copies standalone (6 arrays in, 3 out as in the step)
from pypic_tpu.ops.pallas_cic import block_particles, unblock_particles

u0 = v0[:, 0]
q = jnp.asarray(d["q"], jnp.float32)
qm = q / m_arr
w = q * ((length * density / n) / dx)
act = jnp.ones((n,), jnp.float32)


@jax.jit
def block_loop(p0):
    def one(p, _):
        (pb, ub, qmb, wb, ab), _ = block_particles([p, u0, qm, w, act])
        (sb,), _ = block_particles([species])
        x1 = unblock_particles(pb + 1e-30, n)
        u1 = unblock_particles(ub, n)
        a1 = unblock_particles(ab, n)
        return x1 + 1e-30 * (u1[0] + a1[0] + sb[0, 0, 0] + qmb[0, 0, 0]
                             + wb[0, 0, 0]), None

    p, _ = jax.lax.scan(one, p0, None, length=STEPS)
    return p


r = block_loop(p0)
np.asarray(r)
t0 = time.perf_counter()
r = block_loop(p0 + 1.0)
np.asarray(r)
print(f"block+unblock copies: {(time.perf_counter()-t0)/STEPS*1e3:.3f}"
      " ms/step", flush=True)

# --- v1 stack + KE metric glue standalone
@jax.jit
def glue_loop(u1):
    def one(u, _):
        is_active = act > 0.5
        v1 = jnp.where(is_active[:, None],
                       jnp.stack([u, v0[:, 1], v0[:, 2]], axis=-1), 0.0)
        ke = 0.5 * jnp.sum(m_arr * u * u)
        return u + 1e-30 * (ke + v1[0, 1]), None

    u, _ = jax.lax.scan(one, u1, None, length=STEPS)
    return u


r = glue_loop(u0)
np.asarray(r)
t0 = time.perf_counter()
r = glue_loop(u0 + 1.0)
np.asarray(r)
print(f"v1 stack + KE glue: {(time.perf_counter()-t0)/STEPS*1e3:.3f}"
      " ms/step", flush=True)
