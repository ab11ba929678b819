"""Guiding-center (GC) pusher and 6D <-> GC transforms (vectorized).

Rebuilds the gyro-averaged dynamics of the gen-4 framework:

* ``to_guiding_center``: pygcpic.py:509-551 ``transform_6D_to_GC`` — drop the
  gyro-phase: GC position X = x - r_L, parallel speed v_par = v.b, magnetic
  moment mu = m v_perp^2 / (2|B|).
* ``from_guiding_center``: pygcpic.py:553-596 ``transform_GC_to_6D`` —
  regenerate a random gyro-phase from an RNG key (the reference draws a random
  3-vector and projects out the parallel component).
* ``gc_push_rk4``: pygcpic.py:598-645 ``push_GC``/``_eom_GC`` — RK4 on
  Xdot = E x B / B^2 + v_par b,   v_par_dot = q E.X_hat-projected parallel
  acceleration, mu conserved.

Note on the Larmor vector: the reference computes
``rl_hat = -sign(charge_state) * e * cross(vperp_hat, b)`` (pygcpic.py:544)
— the stray factor ``e`` (1.602e-19) collapses the Larmor offset to ~0 m.
That is a reference defect its own round-trip doctests cannot see (they only
check v_par and speed, pygcpic.py:516-528). The rebuild uses the physical
unit vector ``-sign(q) cross(vperp_hat, b)``; the same round-trip invariants
hold and the GC position actually sits one gyro-radius off the particle.

State layout: GC coordinates are packed like the reference's r-vector
(pygcpic.py:547-549): position (n,3), vpar (n,), mu (n,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import E_CHARGE


def _bhat_wc(b, charge_state, m):
    b = jnp.asarray(b)
    bmag = jnp.sqrt(jnp.sum(b * b))
    bhat = b / bmag
    wc = jnp.abs(charge_state) * E_CHARGE * bmag / m  # (n,)
    return bhat, bmag, wc


def to_guiding_center(pos, v, b, charge_state, m, perp_floor: float = 0.0):
    """6D -> GC. pos: (n,3) [m], v: (n,3). Returns (X, vpar, mu).

    ``perp_floor`` > 0 guards the vperp_hat normalization for exactly
    field-aligned velocities (vperp = 0 -> X = pos, mu = 0 instead of NaN);
    the default 0 keeps the reference's literal division (pygcpic.py:541).
    """
    bhat, bmag, wc = _bhat_wc(b, charge_state, m)
    vpar_mag = v @ bhat  # (n,)
    vpar = vpar_mag[:, None] * bhat[None, :]
    vperp = v - vpar
    vperp_mag = jnp.linalg.norm(vperp, axis=-1)
    vperp_hat = vperp / jnp.maximum(vperp_mag, perp_floor)[:, None]
    mu = 0.5 * m * vperp_mag**2 / bmag
    rl_mag = vperp_mag / wc
    rl_hat = -jnp.sign(charge_state)[:, None] * jnp.cross(
        vperp_hat, jnp.broadcast_to(bhat, vperp_hat.shape)
    )
    x_gc = pos - rl_mag[:, None] * rl_hat
    return x_gc, vpar_mag, mu


def from_guiding_center(key, x_gc, vpar_mag, mu, b, charge_state, m):
    """GC -> 6D with random gyro-phase (pygcpic.py:553-596).

    Returns (pos, v).
    """
    n = x_gc.shape[0]
    bhat, bmag, wc = _bhat_wc(b, charge_state, m)
    vperp_mag = jnp.sqrt(2.0 * mu * bmag / m)
    rl_mag = vperp_mag / wc
    a = jax.random.uniform(key, (n, 3), dtype=x_gc.dtype)
    aperp = a - (a @ bhat)[:, None] * bhat[None, :]
    bperp_hat = aperp / jnp.linalg.norm(aperp, axis=-1)[:, None]
    pos = x_gc + rl_mag[:, None] * bperp_hat
    vperp_hat = jnp.cross(jnp.broadcast_to(bhat, bperp_hat.shape), bperp_hat)
    v = vpar_mag[:, None] * bhat[None, :] + vperp_mag[:, None] * vperp_hat
    return pos, v


def gc_push_rk4(x_gc, vpar, mu, e3, b, charge_state, m, dt,
                eom_form: str = "reference"):
    """RK4 guiding-center push (pygcpic.py:598-645).

    Args:
        x_gc: (n, 3) GC positions [m].
        vpar: (n,) parallel speeds.
        mu: (n,) magnetic moments (conserved; carried through unchanged).
        e3: (n, 3) electric field at the particles.
        b: (3,) magnetic field.
        charge_state, m: (n,) charge number / mass.
        dt: timestep [s].
        eom_form: parallel-acceleration expression —
            'reference' reproduces pygcpic.py:638-639's literal
            vpardot = (E . X) / (|B| vpar / wc): E dotted with the GC
            *position*, which is dimensionally inconsistent (units V, not
            V/m) — a reference defect its own doctests never exercise (no
            reference driver ever calls push_GC; the mode field set at
            pygcpic.py:101 is never branched on);
            'physical' uses the guiding-center parallel force
            vpardot = (q/m) E . bhat — what the magnetized engine's 'gc'
            pusher integrates (there is no reference GC *trajectory* to
            reproduce, so the engine defaults to the physical form).

    Returns:
        (x_gc, vpar, mu) advanced by dt.
    """
    if eom_form not in ("reference", "physical"):
        raise ValueError(f"unknown eom_form {eom_form!r}")
    bhat, bmag, wc = _bhat_wc(b, charge_state, m)
    b2 = bmag * bmag
    exb = jnp.cross(e3, jnp.broadcast_to(jnp.asarray(b), e3.shape)) / b2  # (n,3)
    qm = jnp.sign(charge_state) * wc / bmag  # q/m = charge_state e / m

    def eom(x, vp):
        # Xdot = E x B / B^2 + vpar bhat ; vpardot per eom_form (above)
        xdot = exb + vp[:, None] * bhat[None, :]
        if eom_form == "reference":
            rho = vp / wc
            vpdot = jnp.sum(e3 * x, axis=-1) / (bmag * rho)
        else:
            vpdot = qm * (e3 @ bhat)
        return xdot, vpdot

    k1x, k1v = eom(x_gc, vpar)
    k2x, k2v = eom(x_gc + 0.5 * dt * k1x, vpar + 0.5 * dt * k1v)
    k3x, k3v = eom(x_gc + 0.5 * dt * k2x, vpar + 0.5 * dt * k2v)
    k4x, k4v = eom(x_gc + dt * k3x, vpar + dt * k3v)
    x1 = x_gc + (dt / 6.0) * (k1x + 2.0 * k2x + 2.0 * k3x + k4x)
    v1 = vpar + (dt / 6.0) * (k1v + 2.0 * k2v + 2.0 * k3v + k4v)
    return x1, v1, mu
