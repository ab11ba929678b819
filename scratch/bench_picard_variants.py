"""Measure headline Picard variants on the real TPU (1e8 particles).

Variants: finalize converged/iterate x picard_init extrapolate/extrapolate2
x accel none/anderson. One process, shared problem arrays; each variant
compiles its own program (same static shapes)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402

import jax  # noqa: E402

from pypic_tpu.constants import E_CHARGE, M_ELECTRON  # noqa: E402
from pypic_tpu.engines import implicit  # noqa: E402
from pypic_tpu.runner import run  # noqa: E402

N = 100_000_000
STEPS = 10
TOL = 1e-9

grid, x, v, cfg0 = B._landau_problem(N, TOL)
print(f"backend={jax.default_backend()} n={N:.1e}", flush=True)

VARIANTS = [
    ("extrapolate", "iterate", "none"),
    ("extrapolate2", "iterate", "none"),
    ("extrapolate2", "iterate", "anderson"),
    ("extrapolate", "iterate", "anderson"),
    ("extrapolate", "converged", "none"),  # round-2 baseline, sanity
]

state0 = None
for init, fin, acc in VARIANTS:
    cfg = implicit.ImplicitConfig(
        grid, cfg0.dt, cfg0.p2c, tol=TOL, maxiter=50,
        picard_init=init, finalize=fin, picard_accel=acc,
    )
    if state0 is None:
        state0 = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
    step = implicit.make_step(cfg)

    def go():
        _, m = run(step, state0, STEPS)
        np.asarray(m.field_energy)
        return m

    t0 = time.perf_counter()
    m = go()
    print(f"[{init}/{fin}/{acc}] compile+run {time.perf_counter()-t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    m = go()
    el = time.perf_counter() - t0
    iters = np.asarray(m.picard_iters)
    print(f"[{init}/{fin}/{acc}] {el/STEPS*1e3:.1f} ms/step  "
          f"{N*STEPS/el:.3e} pushes/s  picard mean {iters.mean():.2f}  "
          f"resid[-1] {np.asarray(m.picard_residual)[-1]:.2e}", flush=True)
