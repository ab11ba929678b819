"""Standalone cost of the pscan tridiagonal solve + the full Newton
Boltzmann solve at ng=600 (the magnetized engine's inner solver), v5e.

Round-3 context: the original pscan carried the projective 2x2 products as
an (n, 2, 2) array and the RHS as (n, 1) — Mosaic tiles trailing dims onto
(8, 128) vregs, so those layouts use 1-4 lanes of 128. The rewrite carries
four/k separate (n,) arrays (ops/tridiag.py). This script times the current
form; the pre-rewrite numbers are in PERF.md.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from pypic_tpu.ops.tridiag import solve_tridiag
from pypic_tpu.ops.poisson import solve_boltzmann_dirichlet

REPS = 2000
ng = 600
rng = np.random.default_rng(0)
dl = jnp.ones((ng,), jnp.float32)
d = jnp.full((ng,), -2.0, jnp.float32) - jnp.asarray(
    rng.uniform(0.1, 1.0, ng), jnp.float32
)
du = jnp.ones((ng,), jnp.float32)
b = jnp.asarray(rng.normal(size=ng), jnp.float32)


@jax.jit
def loop_tri(b):
    def one(b, _):
        x = solve_tridiag(dl, d, du, b)
        return x * 1e-3 + b, None

    b, _ = jax.lax.scan(one, b, None, length=REPS)
    return b


r = loop_tri(b)
np.asarray(r)
t0 = time.perf_counter()
np.asarray(loop_tri(b))
print(f"solve_tridiag ng={ng}: "
      f"{(time.perf_counter() - t0) / REPS * 1e3:.4f} ms/solve", flush=True)

rho = jnp.asarray(np.abs(rng.normal(size=ng)) * 1e-2, jnp.float32)
n0 = 1e17
te = 10.0 * 11600.0
dx = 1e-5


@jax.jit
def loop_newton(phi0):
    def one(phi0, _):
        res = solve_boltzmann_dirichlet(rho, n0, te, dx, tol=1e-9,
                                        maxiter=50, phi0=phi0)
        return res.phi, res.iterations

    phi, its = jax.lax.scan(one, phi0, None, length=REPS // 10)
    return phi, its


phi0 = jnp.zeros((ng,), jnp.float32)
r = loop_newton(phi0)
jax.tree.map(np.asarray, r)
t0 = time.perf_counter()
phi, its = loop_newton(phi0)
np.asarray(phi)
print(f"newton boltzmann ng={ng}: "
      f"{(time.perf_counter() - t0) / (REPS // 10) * 1e3:.4f} ms/solve "
      f"(iters {int(np.asarray(its)[-1])} cold->warm "
      f"{int(np.asarray(its)[0])}->{int(np.asarray(its)[-1])})", flush=True)
