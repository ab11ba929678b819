"""Fixed-point iteration accelerators for the Picard field loops.

The implicit engines iterate es -> eh = G(es) to a residual tolerance
(pypic.py:259-289, PIC_L_DD.py:458-533). These helpers modify only the
*iterate update* — the fixed point and the residual test are untouched, so
a tolerance means the same thing with or without acceleration.

``anderson_mix`` is Anderson(1) (secant) mixing: from consecutive map
outputs g_k = G(es_k) and residuals f_k = g_k - es_k, extrapolate
es_{k+1} = g_k - gamma (g_k - g_{k-1}) with the least-squares
gamma = <df, f_k>/<df, df>. For a nearly-linear contraction it squares the
effective rate — decisive on slowly-converging loops (the bounded sheath's
~17 iterations), irrelevant once the loop floors at ~3 (the periodic
implicit engine at tol 1e-9; PERF.md negative result).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def mix_init(e0, mode):
    """Initial accelerator carry. ``mode``: False/'none'/'damped' -> (),
    True / 'anderson' -> (g_prev, f_prev), 'anderson2' -> two histories."""
    if mode in (False, None, "none", "damped"):
        return ()
    if mode in (True, "anderson"):
        return (jnp.zeros_like(e0), jnp.zeros_like(e0))
    if mode == "anderson2":
        z = jnp.zeros_like(e0)
        return (z, z, z, z)
    raise ValueError(f"unknown accelerator mode {mode!r}")


def damped_mix(es, eh, k, aux):
    """Under-relaxed fixed point es_{k+1} = (es_k + eh_k)/2: same fixed
    point. For an iteration error that ROTATES around the fixed point (the
    Picard spiral behind the fixed-odd-count drift resonance, PERF.md), the
    damped multiplier |(1 + rho e^{i theta})/2| is far below |rho| near
    theta ~ pi — and the exit iterate is a two-history average, which
    cancels the first-order alternation bias the raw last iterate carries."""
    return 0.5 * (es + eh), aux


def anderson_mix(es, eh, k, aux, psum_axis: str | None = None):
    """One Anderson(1) update. Returns (es_next, new_aux).

    Safeguards: plain fixed-point on the first iteration and on a degenerate
    secant; the step-size clip keeps a noisy f32 residual from extrapolating
    wildly inside the round-off noise ball. ``psum_axis`` makes the inner
    products global when es/eh are slab-sharded under shard_map.
    """
    if aux == ():
        return eh, aux
    g_prev, f_prev = aux
    f = eh - es
    df = f - f_prev

    def _sum(x):
        s = jnp.sum(x)
        return lax.psum(s, psum_axis) if psum_axis else s

    denom = _sum(df * df)
    gamma = _sum(df * f) / jnp.where(denom > 0, denom, 1.0)
    gamma = jnp.where(denom > 0, jnp.clip(gamma, -5.0, 5.0), 0.0)
    es_next = jnp.where(k > 0, eh - gamma * (eh - g_prev), eh)
    return es_next, (eh, f)


def anderson2_mix(es, eh, k, aux, psum_axis: str | None = None):
    """One Anderson(2) update (two-history least squares). Returns
    (es_next, new_aux) with aux = (g_prev, g_prev2, f_prev, f_prev2).

    Solves the 2x2 normal equations for gamma minimizing
    ||f_k - [df1 df2] gamma|| with df1 = f_k - f_{k-1},
    df2 = f_{k-1} - f_{k-2}, then
    es_next = g_k - g1 (g_k - g_{k-1}) - g2 (g_{k-1} - g_{k-2}).
    Safeguards mirror anderson_mix: plain fixed-point while histories are
    filling (k < 2 falls back to the one-history secant at k == 1), a
    near-singular system falls back to Anderson(1), and the steps clip."""
    if aux == ():
        return eh, aux
    g1p, g2p, f1p, f2p = aux
    f = eh - es
    df1 = f - f1p
    df2 = f1p - f2p

    def _sum(x):
        s = jnp.sum(x)
        return lax.psum(s, psum_axis) if psum_axis else s

    a11 = _sum(df1 * df1)
    a12 = _sum(df1 * df2)
    a22 = _sum(df2 * df2)
    b1 = _sum(df1 * f)
    b2 = _sum(df2 * f)
    det = a11 * a22 - a12 * a12
    # conditioning guard: treat the system as singular when det is tiny
    # relative to the diagonal product (collinear histories)
    ok2 = det > 1e-8 * jnp.maximum(a11 * a22, 1e-30)
    inv_det = 1.0 / jnp.where(ok2, det, 1.0)
    c1 = jnp.clip(jnp.where(ok2, (a22 * b1 - a12 * b2) * inv_det, 0.0),
                  -5.0, 5.0)
    c2 = jnp.clip(jnp.where(ok2, (a11 * b2 - a12 * b1) * inv_det, 0.0),
                  -5.0, 5.0)
    # Anderson(1) fallback for k == 1 or a singular 2-history system
    g1_only = _sum(df1 * f) / jnp.where(a11 > 0, a11, 1.0)
    g1_only = jnp.where(a11 > 0, jnp.clip(g1_only, -5.0, 5.0), 0.0)
    es_a1 = eh - g1_only * (eh - g1p)
    es_a2 = eh - c1 * (eh - g1p) - c2 * (g1p - g2p)
    es_next = jnp.where(k >= 2, jnp.where(ok2, es_a2, es_a1),
                        jnp.where(k == 1, es_a1, eh))
    return es_next, (eh, g1p, f, f1p)
