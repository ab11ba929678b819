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
    """Like ``run`` but keeps metrics only every ``every`` steps (the
    reference's ``nplot`` cadence, pypic.py:579) to bound memory on long runs.

    num_steps must be a multiple of ``every``; the metric kept for each chunk
    is the one from the chunk's final step.
    """
    if num_steps % every:
        raise ValueError("num_steps must be a multiple of every")

    def chunk(s, _):
        def body(s2, _):
            return step_fn(s2)

        s, metrics = lax.scan(body, s, None, length=every)
        last = jax.tree.map(lambda a: a[-1], metrics)
        return s, last

    return lax.scan(chunk, state, None, length=num_steps // every)
