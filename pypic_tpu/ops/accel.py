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


def mix_init(e0, enabled: bool):
    """Initial accelerator carry: (g_prev, f_prev) or () when disabled."""
    return (jnp.zeros_like(e0), jnp.zeros_like(e0)) if enabled else ()


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
