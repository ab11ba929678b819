"""Time-loop runner: lax.scan over a jitted engine step.

Replaces the reference's Python ``for t in range(T)`` driver loops
(pypic.py:557-635, PIC_L_DD.py:415-627) — the whole T-step integration is one
compiled program; per-step metrics come back stacked as (T, ...) arrays for
offline diagnostics/plotting (no matplotlib in the hot loop, SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax import lax


@functools.partial(jax.jit, static_argnums=(0, 2))
def run(step_fn: Callable, state, num_steps: int):
    """Scan ``step_fn`` (state -> (state, metrics)) for num_steps.

    Returns:
        (final_state, metrics) with every metric leaf stacked along a leading
        (num_steps,) axis.
    """

    def body(s, _):
        return step_fn(s)

    return lax.scan(body, state, None, length=num_steps)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def run_thinned(step_fn: Callable, state, num_steps: int, every: int):
    """Like ``run`` but thins only the *heavy* (per-step array) metrics to
    every ``every`` steps; scalar metrics keep full per-step cadence.

    This matches the reference's split: EE/KE time series are appended every
    step (pypic.py:570-576) and only the plotting runs at the ``nplot``
    cadence (pypic.py:579) — so rate fits over scalar series (e.g. the Landau
    peak-envelope fit, diagnostics.damping_rate_from_peaks) stay usable on
    thinned runs, while (ng,)-sized rows (phi, rho, impact buffers) are kept
    once per chunk (the chunk's final step) to bound memory.

    num_steps must be a multiple of ``every``.
    """
    if num_steps % every:
        raise ValueError("num_steps must be a multiple of every")

    # scalar-ness of each metric leaf, from the step's abstract signature
    is_scalar = jax.tree.map(
        lambda a: a.ndim == 0, jax.eval_shape(step_fn, state)[1]
    )

    def chunk(s, _):
        def body(s2, _):
            return step_fn(s2)

        s, metrics = lax.scan(body, s, None, length=every)
        # per-step leaf shapes here are (every, ...): scalars keep all rows,
        # heavy arrays keep the chunk-final row
        mixed = jax.tree.map(
            lambda a, sc: a if sc else a[-1], metrics, is_scalar
        )
        return s, mixed

    final, out = lax.scan(chunk, state, None, length=num_steps // every)
    # scalar leaves come back (chunks, every) -> flatten to (num_steps,)
    out = jax.tree.map(
        lambda a, sc: a.reshape(num_steps) if sc else a, out, is_scalar
    )
    return final, out
