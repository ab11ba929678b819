"""Energy drift per 1e4 steps for the new finalize/init variants (TPU,
n=1e6, canonical violent Landau workload — PERF.md landscape extension)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B  # noqa: E402

from pypic_tpu.constants import E_CHARGE, M_ELECTRON  # noqa: E402
from pypic_tpu.engines import implicit  # noqa: E402
from pypic_tpu.runner import run  # noqa: E402

N = 1_000_000
STEPS = 10_000

VARIANTS = [
    # (label, tol, maxiter, init, finalize, accel)
    ("tol1e-9/extr2/iterate", 1e-9, 50, "extrapolate2", "iterate", "none"),
    ("tol1e-9/extr/iterate", 1e-9, 50, "extrapolate", "iterate", "none"),
    ("fixed6/extr/iterate", 1e-30, 6, "extrapolate", "iterate", "none"),
    ("fixed6/extr2/iterate", 1e-30, 6, "extrapolate2", "iterate", "none"),
    ("tol1e-9/extr2/anderson/iterate", 1e-9, 50, "extrapolate2", "iterate",
     "anderson"),
    ("fixed6/extr/converged(ctrl)", 1e-30, 6, "extrapolate", "converged",
     "none"),
]

for seed_arg in (1,):
    grid, x, v, cfg0 = B._landau_problem(N, 1e-9)
    for label, tol, mi, init, fin, acc in VARIANTS:
        cfg = implicit.ImplicitConfig(
            grid, cfg0.dt, cfg0.p2c, tol=tol, maxiter=mi,
            picard_init=init, finalize=fin, picard_accel=acc,
        )
        st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
        step = implicit.make_step(cfg)
        tot0 = tot1 = None
        iters = []
        done = 0
        while done < STEPS:
            st, m = run(step, st, 1000)
            tot = (np.asarray(m.field_energy, np.float64)
                   + np.asarray(m.kinetic_energy, np.float64))
            if tot0 is None:
                tot0 = tot[0]
            tot1 = tot[-1]
            iters.append(np.asarray(m.picard_iters).mean())
            done += 1000
        print(f"[{label}] drift/{STEPS}: {(tot1 - tot0) / tot0:+.3e}  "
              f"iters {np.mean(iters):.2f}", flush=True)
