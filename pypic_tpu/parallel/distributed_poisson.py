"""Distributed periodic Poisson solve by tridiagonal substructuring.

The large-Ng scaling analog SURVEY.md §5 calls for: the replicated
FFT solve (``ops.solve_periodic_neutralized``) costs O(ng) memory and an
O(ng) ``all_gather`` per step on every shard; this Schur-complement
(substructuring / "partition method") solve keeps everything slab-local —

* each shard solves ONE local Dirichlet-interior tridiagonal system per
  step (O(ng/D) work, the ``pscan`` tridiag) for the particular solution
  ``xp = T^{-1} b_local``;
* the two boundary-response vectors ``u = T^{-1} e_0`` and
  ``w = T^{-1} e_{c-1}`` depend only on the slab size — precomputed in
  float64 numpy at build time and baked as constants;
* the interface unknowns (each slab's first and last node values) satisfy a
  2D x 2D cyclic system whose matrix is also constant — its float64 inverse
  is baked in, so the runtime interface solve is one (2D, 2D) @ (2D,)
  matmul on an ``all_gather`` of just TWO scalars per shard (O(D) comm,
  not O(ng));
* back-substitution is local: ``x = xp - z_left u - y_right w``.

The periodic Laplacian's constant nullspace is handled by pinning the first
interface unknown (the redundant equation is automatically satisfied because
the neutralized RHS sums to zero) and subtracting the mean afterwards, so
the result matches ``solve_periodic_neutralized``'s zero-mean representative.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..constants import EPSILON_0


def _thomas_np(c: int, rhs: np.ndarray) -> np.ndarray:
    """float64 numpy Thomas solve of T x = rhs for T = tridiag(1, -2, 1) of
    size c (Dirichlet-interior operator; rhs may be (c,) or (c, k))."""
    rhs = np.asarray(rhs, np.float64)
    squeeze = rhs.ndim == 1
    if squeeze:
        rhs = rhs[:, None]
    d = np.full(c, -2.0)
    cp = np.zeros(c)
    dp = np.zeros((c, rhs.shape[1]))
    cp[0] = 1.0 / d[0]
    dp[0] = rhs[0] / d[0]
    for i in range(1, c):
        denom = d[i] - cp[i - 1]
        cp[i] = 1.0 / denom
        dp[i] = (rhs[i] - dp[i - 1]) / denom
    x = np.zeros_like(dp)
    x[-1] = dp[-1]
    for i in range(c - 2, -1, -1):
        x[i] = dp[i] - cp[i] * x[i + 1]
    return x[:, 0] if squeeze else x


def make_distributed_periodic_poisson(ng: int, dx: float, num_shards: int,
                                      ax: str):
    """Build the slab-local solver: ``solve(rho_own) -> phi_own`` for use
    inside ``shard_map`` (rho_own / phi_own are the (ng/D,) owned slabs).

    Matches ``ops.solve_periodic_neutralized`` (pypic.py:359-382 semantics)
    up to float32 rounding: zero-mean phi of
    A phi = -dx^2 (rho - <rho>) / eps0.
    """
    if ng % num_shards:
        raise ValueError(f"ng={ng} not divisible by {num_shards} shards")
    c = ng // num_shards
    if c < 2:
        raise ValueError("need at least 2 nodes per shard")
    d_tot = num_shards

    # boundary-response vectors (float64, baked as f32 constants)
    e0 = np.zeros(c)
    e0[0] = 1.0
    ec = np.zeros(c)
    ec[-1] = 1.0
    uw = _thomas_np(c, np.stack([e0, ec], axis=-1))
    u64, w64 = uw[:, 0], uw[:, 1]

    # interface system: unknowns t = [y_0, z_0, y_1, z_1, ...] where
    # y_d = x_d[0], z_d = x_d[c-1]; relations
    #   y_d + u[0]   z_{d-1} + w[0]   y_{d+1} = xp_d[0]
    #   z_d + u[c-1] z_{d-1} + w[c-1] y_{d+1} = xp_d[c-1]
    # (ghost couplings alpha_d = z_{d-1}, beta_d = y_{d+1}); row 0 is
    # replaced by the gauge pin y_0 = 0 (the dropped equation is redundant
    # for a compatible RHS).
    m = np.zeros((2 * d_tot, 2 * d_tot))
    for dd in range(d_tot):
        left = (dd - 1) % d_tot
        right = (dd + 1) % d_tot
        m[2 * dd, 2 * dd] = 1.0
        m[2 * dd, 2 * left + 1] += u64[0]
        m[2 * dd, 2 * right] += w64[0]
        m[2 * dd + 1, 2 * dd + 1] = 1.0
        m[2 * dd + 1, 2 * left + 1] += u64[-1]
        m[2 * dd + 1, 2 * right] += w64[-1]
    m[0, :] = 0.0
    m[0, 0] = 1.0  # pin y_0 = 0
    m_inv32 = jnp.asarray(np.linalg.inv(m), jnp.float32)
    u32 = jnp.asarray(u64, jnp.float32)
    w32 = jnp.asarray(w64, jnp.float32)

    from ..ops import solve_tridiag

    dl = jnp.ones((c,), jnp.float32)
    dg = jnp.full((c,), -2.0, jnp.float32)
    du = jnp.ones((c,), jnp.float32)

    def solve(rho_own):
        mean_rho = lax.psum(jnp.sum(rho_own), ax) / ng
        b = -(dx * dx) * (rho_own - mean_rho) / EPSILON_0
        xp = solve_tridiag(dl, dg, du, b)

        # interface RHS: TWO scalars per shard, gathered interleaved; the
        # pinned row's entry is zero
        d = lax.axis_index(ax)
        g_local = jnp.stack([xp[0], xp[-1]])
        g = lax.all_gather(g_local, ax, tiled=True)  # (2 D,)
        g = g.at[0].set(0.0)
        t = m_inv32 @ g

        z_left = t[2 * ((d - 1) % d_tot) + 1]
        y_right = t[2 * ((d + 1) % d_tot)]
        x = xp - z_left * u32 - y_right * w32

        mean_phi = lax.psum(jnp.sum(x), ax) / ng
        return x - mean_phi

    return solve
