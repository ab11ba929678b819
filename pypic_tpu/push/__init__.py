"""Particle pushers: leapfrog, Crank-Nicolson, Boris-Buneman, guiding-center."""

from .leapfrog import leapfrog_push, cn_push  # noqa: F401
from .boris import boris_push_dt  # noqa: F401
from .guiding_center import (  # noqa: F401
    to_guiding_center,
    from_guiding_center,
    gc_push_rk4,
)
