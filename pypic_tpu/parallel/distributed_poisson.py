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


def make_distributed_tridiag_chain(c: int, num_shards: int, ax: str):
    """Distributed tridiagonal solve with RUNTIME coefficients on a slab
    chain (no wrap): ``solve(dl_own, d_own, du_own, f_own) -> x_own`` for
    use inside ``shard_map``, each operand the (ng/D,)-sized owned slab of
    the global system A x = f.

    Same Schur-complement substructuring as
    ``make_distributed_periodic_poisson``, generalized to coefficients that
    change every call (the Newton-Boltzmann Jacobian's diagonal depends on
    the current phi, pygcpic.py:1030-1032): the two boundary-response
    vectors are solved at runtime alongside the particular solution (one
    batched 3-RHS local tridiag), and the (2D, 2D) interface system is
    assembled from an all_gather of SIX scalars per shard and solved
    replicated (D <= 16 in practice — a dense solve of a 32x32 at most).

    The chain has no wrap link: shard 0's first row and shard D-1's last
    row carry their GLOBAL couplings (dl[0] / du[-1] are unused by
    convention, so the end couplings vanish naturally and the interface
    matrix is block-bidiagonal).

    Stability: intended for diagonally dominant systems (the Boltzmann
    Jacobian always is — its diagonal only grows more negative); not a
    general pivoted solver.
    """
    d_tot = num_shards
    if c < 2:
        raise ValueError("need at least 2 nodes per shard")

    e_first = jnp.zeros((c,), jnp.float32).at[0].set(1.0)
    e_last = jnp.zeros((c,), jnp.float32).at[-1].set(1.0)

    # static scatter indices for the (2D, 2D) interface matrix:
    # unknowns t = [y_0, z_0, y_1, z_1, ...] with y_d = x_d[0],
    # z_d = x_d[c-1]; row 2d:   y_d + a0 u[0] z_{d-1} + cc w[0] y_{d+1} = xp[0]
    #                row 2d+1:  z_d + a0 u[-1] z_{d-1} + cc w[-1] y_{d+1} = xp[-1]
    # end couplings (a0 on shard 0, cc on shard D-1) are zero, so the
    # wrapped column indices they would write are multiplied by 0.
    rows, cols = [], []
    for dd in range(d_tot):
        left = (dd - 1) % d_tot
        right = (dd + 1) % d_tot
        rows += [2 * dd, 2 * dd, 2 * dd + 1, 2 * dd + 1]
        cols += [2 * left + 1, 2 * right, 2 * left + 1, 2 * right]
    rows_idx = jnp.asarray(rows, jnp.int32)
    cols_idx = jnp.asarray(cols, jnp.int32)
    eye = jnp.eye(2 * d_tot, dtype=jnp.float32)

    from ..ops import solve_tridiag

    def solve(dl_own, d_own, du_own, f_own):
        d = lax.axis_index(ax)
        a0 = jnp.where(d == 0, 0.0, dl_own[0])  # global end rows: no ghost
        cc = jnp.where(d == d_tot - 1, 0.0, du_own[-1])
        # local interior operator: ghost couplings removed
        dl_in = dl_own.at[0].set(0.0)
        du_in = du_own.at[-1].set(0.0)
        rhs = jnp.stack([f_own, e_first, e_last], axis=-1)
        sols = solve_tridiag(dl_in, d_own, du_in, rhs)
        xp, u, w = sols[:, 0], sols[:, 1], sols[:, 2]

        g_local = jnp.stack([
            xp[0], xp[-1], a0 * u[0], a0 * u[-1], cc * w[0], cc * w[-1],
        ])
        g = lax.all_gather(g_local, ax)  # (D, 6)
        vals = jnp.stack(
            [g[:, 2], g[:, 4], g[:, 3], g[:, 5]], axis=-1
        ).reshape(-1)  # per shard: [a0 u0, cc w0, a0 u1, cc w1]
        m = eye.at[rows_idx, cols_idx].add(vals)
        rhs_if = jnp.stack([g[:, 0], g[:, 1]], axis=-1).reshape(-1)
        t = jnp.linalg.solve(m, rhs_if)

        z_left = jnp.where(d == 0, 0.0, t[2 * ((d - 1) % d_tot) + 1])
        y_right = jnp.where(d == d_tot - 1, 0.0, t[2 * ((d + 1) % d_tot)])
        return xp - (z_left * a0) * u - (y_right * cc) * w

    return solve


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
