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
    True / 'anderson' -> (g_prev, f_prev), 'anderson2' -> two histories,
    'andersonM' (M an integer >= 1, e.g. 'anderson5') -> (g_hist, f_hist)
    ring buffers of M histories."""
    if mode in (False, None, "none", "damped"):
        return ()
    if mode in (True, "anderson"):
        return (jnp.zeros_like(e0), jnp.zeros_like(e0))
    if mode == "anderson2":
        z = jnp.zeros_like(e0)
        return (z, z, z, z)
    m = anderson_depth(mode)
    if m is not None:
        z = jnp.zeros((m + 1,) + e0.shape, e0.dtype)
        return (z, z)
    raise ValueError(f"unknown accelerator mode {mode!r}")


def anderson_depth(mode):
    """Parse 'andersonM' -> M (int), else None ('anderson'/'anderson2'
    keep their dedicated fixed-shape implementations)."""
    if isinstance(mode, str) and mode.startswith("anderson"):
        tail = mode[len("anderson"):]
        if tail.isdigit() and int(tail) > 2:
            return int(tail)
    return None


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


def anderson_m_mix(es, eh, k, aux, m: int, psum_axis: str | None = None,
                   reg: float = 1e-8):
    """One Anderson(m) update over ring-buffered histories. Returns
    (es_next, new_aux) with aux = (g_hist, f_hist), each ((m+1,) + es.shape)
    holding the most recent map outputs / residuals (row 0 newest after the
    update).

    Solves the regularized normal equations for the least-squares
    combination of the last ``min(k, m)`` residual differences
    dF_j = f_{k-j+1} - f_{k-j} (Walker & Ni 2011, SIAM J. Numer. Anal. —
    the standard Anderson acceleration; for a linear map this is GMRES on
    the fixed-point residual, so depth m converges in at most
    rank+1 iterations). Histories beyond k are masked out of the system, so
    warm-up falls back smoothly (k == 0 is plain fixed point, k == 1 the
    secant). Tikhonov ``reg`` times the diagonal scale keeps the f32 system
    solvable when histories collinearize; steps clip like anderson_mix.
    """
    if aux == ():
        return eh, aux
    g_hist, f_hist = aux
    f = eh - es

    def _sum(x, axes):
        s = jnp.sum(x, axis=axes)
        return lax.psum(s, psum_axis) if psum_axis else s

    # histories: row j holds (g, f) from iteration k-1-j (j < k valid)
    dg = g_hist[:m] - g_hist[1:m + 1]  # (m, ng): dG_j = g_{k-j} - g_{k-j-1}
    df = f_hist[:m] - f_hist[1:m + 1]
    # row j uses g_{k-j} (valid once k >= j+1) and g_{k-j-1} (k >= j+2),
    # except row 0 whose g_{k} is the current eh handled below — shift:
    # we store AFTER computing, so at entry row j is from iteration k-1-j;
    # dG_0 = g_k - g_{k-1} needs the current (eh, f):
    dg = dg.at[1:].set(dg[:-1]).at[0].set(eh - g_hist[0])
    df = df.at[1:].set(df[:-1]).at[0].set(f - f_hist[0])
    valid = (jnp.arange(m) < k).astype(es.dtype)
    df = df * valid[(...,) + (None,) * (df.ndim - 1)]
    dg = dg * valid[(...,) + (None,) * (dg.ndim - 1)]

    red_axes = tuple(range(1, df.ndim))
    a = _sum(df[:, None] * df[None, :],
             tuple(ax + 1 for ax in red_axes))  # (m, m)
    b = _sum(df * f[None], red_axes)  # (m,)
    scale = jnp.maximum(jnp.max(jnp.diagonal(a)), 1e-30)
    a = a + (reg * scale + 1e-30) * jnp.eye(m, dtype=a.dtype)
    gamma = jnp.linalg.solve(a, b)
    # at the f32 residual floor the history differences are pure round-off
    # noise and the (regularized) solve can still emit inf/nan — fall back
    # to plain fixed point there rather than poisoning the iterate
    gamma = jnp.where(jnp.isfinite(gamma), gamma, 0.0)
    gamma = jnp.clip(gamma, -5.0, 5.0)
    # trust region: the map is only piecewise-smooth (wall-absorption
    # status flips between iterates), so a near-collinear history can
    # produce a huge extrapolation that NaNs the next particle sweep —
    # cap the correction at 10x the current residual norm
    delta = jnp.tensordot(gamma, dg, axes=1)
    dn = jnp.sqrt(_sum(delta * delta, tuple(range(delta.ndim))))
    fn = jnp.sqrt(_sum(f * f, tuple(range(f.ndim))))
    cap = 10.0 * fn
    delta = delta * jnp.where(dn > cap, cap / jnp.maximum(dn, 1e-30), 1.0)
    es_next = eh - delta
    es_next = jnp.where(k > 0, es_next, eh)

    g_hist = jnp.roll(g_hist, 1, axis=0).at[0].set(eh)
    f_hist = jnp.roll(f_hist, 1, axis=0).at[0].set(f)
    return es_next, (g_hist, f_hist)


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
