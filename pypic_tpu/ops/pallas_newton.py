"""One-kernel Newton-Boltzmann Poisson solve (Pallas TPU).

Why this exists: the magnetized engine's Newton-Boltzmann solve
(ops.poisson.solve_boltzmann_dirichlet, reference pygcpic.py:1005-1053) is
the largest remaining item of the 1e6-particle step budget — 0.35 ms at
ng=600 / ~3.4 warm iterations on v5e. The cost is NOT flops: each Newton
iteration is ~100 us of XLA op-dispatch latency over (600,)-element arrays
(the O(log n) associative-scan tridiagonal solve alone is ~20 unfusable
stages of slices/concats). Measured dead ends (PERF.md round 3): a joint
3x3 projective scan (1.45x slower), an in-kernel sequential Thomas (Mosaic
scalar recurrences run ~308 ns/step -> 185 us/solve), and extrapolated warm
starts (raise the iteration count).

The structural fix is to run the ENTIRE Newton loop inside one Pallas
kernel with everything resident in VMEM: residual build, Jacobian, a
parallel-cyclic-reduction (PCR) tridiagonal solve out of static
``pltpu.roll`` lane rotations (log2(ng) stages, ~6 rolls + ~15 elementwise
vector ops each), the globalization clip, and the convergence test as an
in-kernel ``lax.while_loop``. No per-op XLA dispatch, no HBM round-trips
between iterations.

Numerics: PCR is algebraically exact for the same tridiagonal system the
Thomas/pscan path solves; summation order differs, so converged phi agrees
to the Newton tolerance (equivalence-tested vs ops.poisson), not bit-for-
bit. The globalization (exponent clamp + step clip) matches
ops.poisson._safe_exp / step_max exactly.

Boundary structure reproduced from pygcpic.py:939-956 via
ops.poisson._dirichlet_diagonals: identity rows at both walls, residual
rows 0/ng-1 forced to zero, boundary Jacobian diagonal -dx^2 c0 c1
(pygcpic.py:1030-1032 envelope).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPSILON_0, E_CHARGE, K_BOLTZMANN
from .poisson import NewtonResult, _EXP_CLAMP
from .pallas_cic import _interpret

__all__ = ["boltzmann_dirichlet_pallas", "boltzmann_dn_pallas"]

_LANE = 128


def _shift_down(x, s, fill, col):
    """x_{i-s} with ``fill`` where i-s < 0 (masked circular roll)."""
    return jnp.where(col >= s, pltpu.roll(x, s, axis=1), fill)


def _shift_up(x, s, fill, col, ngp):
    """x_{i+s} with ``fill`` where i+s >= ngp (left roll as right roll by
    ngp - s: pltpu.roll requires a non-negative shift)."""
    return jnp.where(col < ngp - s, pltpu.roll(x, ngp - s, axis=1), fill)


def _pcr_solve(a, b, c, f, col, ngp):
    """Parallel cyclic reduction for the tridiagonal system
    a_i x_{i-1} + b_i x_i + c_i x_{i+1} = f_i, i in [0, ngp).

    Rows outside the physical range must be identity (a=c=0, b=1, f=0).
    log2(ngp) static stages; after stride s the remaining couplings sit at
    distance 2s, so stride >= ngp/2 decouples every equation.
    """
    s = 1
    while s < ngp:
        am = _shift_down(a, s, 0.0, col)
        bm = _shift_down(b, s, 1.0, col)
        fm = _shift_down(f, s, 0.0, col)
        cm = _shift_down(c, s, 0.0, col)
        ap = _shift_up(a, s, 0.0, col, ngp)
        bp = _shift_up(b, s, 1.0, col, ngp)
        fp = _shift_up(f, s, 0.0, col, ngp)
        cp = _shift_up(c, s, 0.0, col, ngp)
        alpha = -a / bm
        gamma = -c / bp
        b = b + alpha * cm + gamma * ap
        f = f + alpha * fm + gamma * fp
        a = alpha * am
        c = gamma * cp
        s *= 2
    return f / b


def _newton_dd_kernel(scal_ref, c2_ref, phi0_ref, phi_ref, stat_ref,
                      *, ng, ngp, c1, dx2, tol, maxiter, step_max):
    c0 = scal_ref[0, 0]
    col = lax.broadcasted_iota(jnp.int32, (1, ngp), 1)
    valid = col < ng
    interior = (col >= 1) & (col <= ng - 2)
    boundary = valid & ~interior
    # Dirichlet Laplacian diagonals (ops.poisson._dirichlet_diagonals):
    # identity wall rows; identity padding rows keep PCR inert there.
    a_lap = jnp.where(interior, 1.0, 0.0)
    c_lap = a_lap
    d_lap = jnp.where(interior, -2.0, 1.0)
    c2 = c2_ref[:]

    def body(carry):
        phi, _, it = carry
        expo = jnp.exp(jnp.clip(c1 * phi, -_EXP_CLAMP, _EXP_CLAMP))
        lap = (a_lap * _shift_down(phi, 1, 0.0, col)
               + d_lap * phi
               + c_lap * _shift_up(phi, 1, 0.0, col, ngp))
        f = lap - dx2 * c0 * expo + dx2 * c2
        f = jnp.where(interior, f, 0.0)  # walls + padding: residual rows 0
        ddiag = jnp.where(
            interior, -dx2 * c0 * c1 * expo,
            jnp.where(boundary, -dx2 * c0 * c1, 0.0),
        )
        dphi = _pcr_solve(a_lap, d_lap + ddiag, c_lap, f, col, ngp)
        dphi = jnp.clip(dphi, -step_max, step_max)
        phi = phi - dphi
        return phi, jnp.sum(dphi * dphi), it + 1

    def cond(carry):
        _, residual, it = carry
        return (residual > tol) & (it < maxiter)

    phi, residual, it = lax.while_loop(
        cond, body,
        (phi0_ref[:], jnp.asarray(1.0, jnp.float32),
         jnp.asarray(0, jnp.int32)),
    )
    # shift to min 0 over the physical rows (pygcpic.py:1053)
    big = jnp.asarray(np.float32(np.finfo(np.float32).max))
    phi_ref[:] = phi - jnp.min(jnp.where(valid, phi, big))
    _store_stats(stat_ref, residual, it)


def _store_stats(stat_ref, residual, it):
    """Write (residual, iters) into lanes 0/1 of the (1, _LANE) stats row.

    Mosaic rejects scalar stores to VMEM (`stat_ref[0, 0] = residual`
    raises "Cannot store scalars to VMEM" at lowering), so build the full
    row with a lane-iota select and store it in one vector write."""
    scol = lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    stat_ref[:] = jnp.where(
        scol == 0, residual,
        jnp.where(scol == 1, it.astype(jnp.float32), 0.0),
    )


def _newton_dn_kernel(scal_ref, c2_ref, phi0_ref, phi_ref, stat_ref,
                      *, ng, ngp, c1, dx2, tol, maxiter, step_max):
    """Dirichlet-Neumann Newton (ops.poisson.solve_boltzmann_dirichlet_
    neumann, pygcpic.py:1062-1109): the one-sided Neumann row
    (..., 1, -4, 3) is tridiagonal + the rank-1 A[-1, -3] entry, solved by
    Sherman-Morrison on a 2-RHS PCR (the f and e_{ng-1} columns share the
    elimination coefficients). Residual is ||dphi||_2 (NOT the D-D kernel's
    squared norm — reference parity)."""
    c0 = scal_ref[0, 0]
    col = lax.broadcasted_iota(jnp.int32, (1, ngp), 1)
    valid = col < ng
    inner = (col >= 1) & (col <= ng - 2)
    # tridiagonal part of the D-N Laplacian (ops.poisson lines: dl ends -4,
    # d = [1, -2 .., 3], du[0] = 0); padding rows identity
    a_lap = jnp.where(inner, 1.0, jnp.where(col == ng - 1, -4.0, 0.0))
    c_lap = jnp.where(inner, 1.0, 0.0)
    d_lap = jnp.where(inner, -2.0,
                      jnp.where(col == ng - 1, 3.0, 1.0))
    u_row = jnp.where(col == ng - 1, 1.0, 0.0)  # rank-1 u = e_{ng-1}
    c2 = c2_ref[:]

    def body(carry):
        phi, _, it = carry
        expo = jnp.exp(jnp.clip(c1 * phi, -_EXP_CLAMP, _EXP_CLAMP))
        lap = (a_lap * _shift_down(phi, 1, 0.0, col)
               + d_lap * phi
               + c_lap * _shift_up(phi, 1, 0.0, col, ngp))
        phi_m3 = jnp.sum(jnp.where(col == ng - 3, phi, 0.0))
        phi_0 = jnp.sum(jnp.where(col == 0, phi, 0.0))
        lap = lap + u_row * phi_m3  # A[-1, -3] extra entry
        f = lap - dx2 * c0 * expo + dx2 * c2
        # reference row overrides: f[0] = phi[0], f[-1] = 0, padding 0
        f = jnp.where(col == 0, phi_0, f)
        f = jnp.where((col == ng - 1) | ~valid, 0.0, f)
        ddiag = jnp.where(inner, -dx2 * c0 * c1 * expo,
                          jnp.where(col == 0, -dx2 * c0 * c1, 0.0))
        rhs = jnp.concatenate([f, u_row], axis=0)  # (2, ngp)
        sol = _pcr_solve(a_lap, d_lap + ddiag, c_lap, rhs, col, ngp)
        y = sol[0:1]
        z = sol[1:2]
        vy = jnp.sum(jnp.where(col == ng - 3, y, 0.0))
        vz = jnp.sum(jnp.where(col == ng - 3, z, 0.0))
        dphi = y - z * (vy / (1.0 + vz))
        dphi = jnp.clip(dphi, -step_max, step_max)
        phi = phi - dphi
        return phi, jnp.sqrt(jnp.sum(dphi * dphi)), it + 1

    def cond(carry):
        _, residual, it = carry
        return (residual > tol) & (it < maxiter)

    phi, residual, it = lax.while_loop(
        cond, body,
        (phi0_ref[:], jnp.asarray(1.0, jnp.float32),
         jnp.asarray(0, jnp.int32)),
    )
    big = jnp.asarray(np.float32(np.finfo(np.float32).max))
    phi_ref[:] = phi - jnp.min(jnp.where(valid, phi, big))
    _store_stats(stat_ref, residual, it)


def boltzmann_dn_pallas(n, n0, te, dx, phi0, tol=1e-3, maxiter=100):
    """Drop-in one-kernel form of
    ops.poisson.solve_boltzmann_dirichlet_neumann (note: takes the NUMBER
    density n, c2 = e n / eps0 — pygcpic.py:1089)."""
    ng = n.shape[0]
    if n.dtype != jnp.float32:
        raise TypeError("boltzmann_dn_pallas is f32-only")
    ngp = max(_LANE, 1 << (ng - 1).bit_length())
    c1 = float(E_CHARGE / (K_BOLTZMANN * float(te)))
    dx2 = float(dx) * float(dx)
    c0 = (E_CHARGE / EPSILON_0) * jnp.asarray(n0, jnp.float32)
    scal = jnp.reshape(c0, (1, 1))
    pad = ngp - ng
    c2 = jnp.pad(n * np.float32(E_CHARGE / EPSILON_0), (0, pad))[None, :]
    p0 = jnp.pad(phi0.astype(jnp.float32), (0, pad))[None, :]

    kernel = functools.partial(
        _newton_dn_kernel, ng=ng, ngp=ngp, c1=np.float32(c1),
        dx2=np.float32(dx2), tol=np.float32(tol), maxiter=int(maxiter),
        step_max=np.float32(_EXP_CLAMP / c1),
    )
    phi, stat = pl.pallas_call(
        kernel,
        in_specs=(
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, ngp), jnp.float32),
            jax.ShapeDtypeStruct((1, _LANE), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, c2, p0)
    return NewtonResult(
        phi[0, :ng], stat[0, 1].astype(jnp.int32), stat[0, 0]
    )


def boltzmann_dirichlet_pallas(rho, n0, te, dx, tol=1e-9, maxiter=1000,
                               phi0=None):
    """Drop-in one-kernel form of ops.poisson.solve_boltzmann_dirichlet.

    te/dx/tol/maxiter are static; rho/n0/phi0 are traced. f32 only (the
    magnetized engine's compute dtype); falls back upstream for others.
    """
    ng = rho.shape[0]
    if rho.dtype != jnp.float32:
        raise TypeError("boltzmann_dirichlet_pallas is f32-only")
    ngp = max(_LANE, 1 << (ng - 1).bit_length())
    c1 = float(E_CHARGE / (K_BOLTZMANN * float(te)))
    dx2 = float(dx) * float(dx)
    c0 = (E_CHARGE / EPSILON_0) * jnp.asarray(n0, jnp.float32)
    scal = jnp.reshape(c0, (1, 1))
    pad = ngp - ng
    c2 = jnp.pad(rho / np.float32(EPSILON_0), (0, pad))[None, :]
    if phi0 is None:
        p0 = jnp.zeros((ng,), jnp.float32)
    else:
        # pin the warm start's wall entries to 0 (ops.poisson.
        # solve_boltzmann_dirichlet semantics: the frozen boundary rows
        # never move the walls — see that docstring)
        p0 = phi0.astype(jnp.float32).at[0].set(0.0).at[-1].set(0.0)
    p0 = jnp.pad(p0, (0, pad))[None, :]

    kernel = functools.partial(
        _newton_dd_kernel, ng=ng, ngp=ngp, c1=np.float32(c1),
        dx2=np.float32(dx2), tol=np.float32(tol), maxiter=int(maxiter),
        step_max=np.float32(_EXP_CLAMP / c1),
    )
    phi, stat = pl.pallas_call(
        kernel,
        in_specs=(
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, ngp), jnp.float32),
            jax.ShapeDtypeStruct((1, _LANE), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, c2, p0)
    return NewtonResult(
        phi[0, :ng], stat[0, 1].astype(jnp.int32), stat[0, 0]
    )
