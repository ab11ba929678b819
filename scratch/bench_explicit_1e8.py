"""Explicit engine ms/step at 1e8 (fused leapfrog sweep + current windows)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from pypic_tpu.constants import E_CHARGE, M_ELECTRON
from pypic_tpu.engines import explicit
from pypic_tpu.runner import run

# reuse bench.py's problem builder
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod", "/root/repo/bench.py")
benchmod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(benchmod)

N, STEPS = 6104 * 16384, 10  # smallest block multiple >= 1e8 (free reshapes)
grid, x, v, _ = benchmod._landau_problem(N, 1e-9)
cfg = explicit.ExplicitConfig(grid, 1e-5, grid.length * 1e5 / N)
st = explicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
step = explicit.make_step(cfg)

def go():
    _, m = run(step, st, STEPS)
    np.asarray(m.field_energy)

t0 = time.perf_counter(); go()
print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter(); go()
el = time.perf_counter() - t0
print(f"explicit 1e8: {el/STEPS*1e3:.1f} ms/step ({N*STEPS/el:.3e} pushes/s)")
