"""CPU f32 drift A/B for the window-share flip (round 3c).

The shared-window Picard pass is trajectory-equivalence-tested against the
separate-window pass over short horizons; this measures the 1e4-step energy
drift of BOTH on the canonical violent workload (perturbation-0.8 Landau,
conserving fixed-4 + extrapolate + Anderson config) at n=65536 on CPU
(interpret-mode kernels — same f32 arithmetic class as TPU; PERF.md's f32
CPU control matched the TPU drift band). If shared lands in the same drift
band as separate, the remaining TPU A/B is about SPEED only.

Usage: python scratch/drift_window_share_cpu.py {separate|shared} SEED
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from pypic_tpu import GridSpec, constants as c, initialize  # noqa: E402
from pypic_tpu.engines import implicit  # noqa: E402
from pypic_tpu.runner import run  # noqa: E402

mode, seed = sys.argv[1], int(sys.argv[2])
n, steps, chunk = 65536, 10_000, 500

density, te = 1e5, 100.0 * 11600.0  # pypic.py:846-855 canonical preset
debye = np.sqrt(c.K_BOLTZMANN * te * c.EPSILON_0 / c.E_CHARGE**2 / density)
grid = GridSpec(200, 22.0 * debye, "periodic")
x, v, p = initialize.initialize_periodic(
    "landau-damping", n, density, 1, 0.8, grid, te, te, seed=seed)
cfg = implicit.ImplicitConfig(
    grid, 1e-5, p.p2c, tol=1e-30, maxiter=4, backend="fused",
    picard_init="extrapolate", picard_accel="anderson", window_share=mode)
st = implicit.init_state(x, v, -c.E_CHARGE, c.M_ELECTRON, cfg)
step = implicit.make_step(cfg)

tot0 = None
clamped = 0
t0 = time.time()
done = 0
while done < steps:
    st, m = run(step, st, chunk)
    done += chunk
    fe = np.asarray(m.field_energy, np.float64)
    ke = np.asarray(m.kinetic_energy, np.float64)
    tot = fe + ke
    if tot0 is None:
        tot0 = tot[0]
    if hasattr(m, "picard_clamped"):
        clamped += int(np.asarray(m.picard_clamped).sum())
    print(f"{mode} seed={seed} step {done}: drift "
          f"{(tot[-1] - tot0) / tot0:+.3e} clamped={clamped} "
          f"({time.time() - t0:.0f}s)", flush=True)
print(f"FINAL {mode} seed={seed}: drift/1e4 "
      f"{(tot[-1] - tot0) / tot0:+.3e} clamped={clamped}")
