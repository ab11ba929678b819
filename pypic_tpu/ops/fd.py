"""Finite-difference / smoothing / integration grid operators.

Rebuilds the reference's L1 field operators as pure vectorized functions:

* ``smooth_periodic``: binomial 1/4 (1, 2, 1) filter with periodic wrap
  (pypic.py:63-76 ``smooth_field_p``).
* ``smooth_bounded``: same filter preserving endpoint values
  (PIC_L_DD.py:216-221 ``smoothField``, pygcpic.py:1055-1060 ``smooth_rho``).
* ``grad_periodic``: centered difference with periodic wrap
  (pypic.py:185-214 ``differentiate_p``; note the reference wraps the left
  neighbour implicitly through numpy negative indexing — an intentional
  periodic stencil, reproduced here with rolls).
* ``grad_neg_bounded``: E = -dphi/dx with centered interior and one-sided ends
  (PIC_L_DD.py:192-203 ``differentiateField``,
  pygcpic.py:907-937 ``differentiate_phi_to_E_dirichlet``).
* ``integrate_neg_trapz``: phi from E by cumulative negative trapezoid
  (PIC_L_DD.py:205-214 ``integrateField``), vectorized with a cumsum instead
  of the reference's O(ng^2) per-node ``np.trapz`` loop.
* ``differentiate_time_series``: centered time derivative with one-sided ends
  (pypic.py:302-335 ``differentiate_t``), used by Landau first-peak detection.
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_periodic(f):
    return (jnp.roll(f, -1) + 2.0 * f + jnp.roll(f, 1)) * 0.25


def smooth_bounded(f):
    s = (jnp.roll(f, -1) + 2.0 * f + jnp.roll(f, 1)) * 0.25
    s = s.at[0].set(f[0])
    s = s.at[-1].set(f[-1])
    return s


def grad_periodic(f, dx):
    """(f[i+1] - f[i-1]) / (2 dx) with periodic wrap."""
    return (jnp.roll(f, -1) - jnp.roll(f, 1)) * (0.5 / dx)


def grad_neg_bounded(f, dx):
    """-df/dx: centered interior, one-sided first-order at both walls."""
    interior = -(jnp.roll(f, -1) - jnp.roll(f, 1)) * (0.5 / dx)
    out = interior
    out = out.at[0].set(-(f[1] - f[0]) / dx)
    out = out.at[-1].set(-(f[-1] - f[-2]) / dx)
    return out


def integrate_neg_trapz(f, dx):
    """IF[i] = -trapz(f[:i+1], dx): cumulative negative trapezoid from node 0."""
    c = jnp.cumsum(f)
    return -(c - 0.5 * f[0] - 0.5 * f) * dx


def differentiate_time_series(f, dt):
    """Centered time derivative, one-sided at both ends (pypic.py:302-335)."""
    df = (jnp.roll(f, -1) - jnp.roll(f, 1)) * (0.5 / dt)
    df = df.at[0].set((f[1] - f[0]) / dt)
    df = df.at[-1].set((f[-1] - f[-2]) / dt)
    return df
