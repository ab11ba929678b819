"""Boris-Buneman particle pusher (vectorized).

Rebuilds ``Particle.push_6D`` (pygcpic.py:460-507) as a pure function over
particle arrays: half electric kick, magnetic rotation through the (t, s)
vectors, half electric kick, then drift. The electric field has only an x
component on the 1D grid (pygcpic.py:480,500 kick r[3] only); B is a constant
3-vector per run (pygcpic.py:1329).

Charge convention: q = charge_state * E_CHARGE with integer charge_state, the
convention of the working driver ``pic_bca_aps`` (pygcpic.py:1386 passes
charge_state=1). (``pic_iead`` passes charge_state=e — a reference
inconsistency that would square the elementary charge in pygcpic.py:478; the
rebuild's presets use integer charge states throughout.)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import E_CHARGE


def boris_push_dt(x, yz, v, ex, b, charge_state, m, dt):
    """Boris-Buneman push over dt (pygcpic.py:460-507).

    Args:
        x: (n,) x positions [m].
        yz: (n, 2) lateral positions [m].
        v: (n, 3) velocities [m/s].
        ex: (n,) E_x at particles [V/m].
        b: (3,) magnetic field [T].
        charge_state: (n,) charge number.
        m: (n,) mass [kg].
        dt: timestep [s].

    Returns:
        (x1, yz1, v1).
    """
    const = (0.5 * dt * E_CHARGE) * charge_state / m  # (n,)

    vx = v[:, 0] + const * ex
    vy = v[:, 1]
    vz = v[:, 2]

    tx = const * b[0]
    ty = const * b[1]
    tz = const * b[2]
    t2 = tx * tx + ty * ty + tz * tz

    sx = 2.0 * tx / (1.0 + t2)
    sy = 2.0 * ty / (1.0 + t2)
    sz = 2.0 * tz / (1.0 + t2)

    vfx = vx + vy * tz - vz * ty
    vfy = vy + vz * tx - vx * tz
    vfz = vz + vx * ty - vy * tx

    vx = vx + (vfy * sz - vfz * sy)
    vy = vy + (vfz * sx - vfx * sz)
    vz = vz + (vfx * sy - vfy * sx)

    vx = vx + const * ex

    x1 = x + vx * dt
    yz1 = yz + jnp.stack([vy, vz], axis=-1) * dt
    v1 = jnp.stack([vx, vy, vz], axis=-1)
    return x1, yz1, v1
