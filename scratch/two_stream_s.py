"""two_stream row floor study (VERDICT round-3 'what's weak' item 1 /
next-round item 3): the 1e4-particle explicit row is dispatch-floored at
S=200 steps-per-kernel. A/B larger resident S (fewer dispatches) and a
larger step count to find where the row lands vs the tunnel-dispatch
floor model.

Run on TPU: python scratch/two_stream_s.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pypic_tpu.constants import E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON
from pypic_tpu.grid import GridSpec
from pypic_tpu import initialize as init
from pypic_tpu.engines import explicit

n = 10_000
density = 1e10
te = 0.1 * 11600.0
debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
grid = GridSpec(200, 15.0 * debye, "periodic")
x, v, params = init.initialize_periodic(
    "two-stream", n, density, 1, 0.05, grid, te, te, seed=2)
cfg = explicit.ExplicitConfig(grid, 0.1 / params.wp, params.p2c)
st = explicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)


def timeit(steps, s):
    def go():
        _, m = explicit.run_resident(cfg, st, steps, steps_per_call=s)
        np.asarray(m.field_energy)

    t0 = time.perf_counter()
    go()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        go()
        best = min(best, time.perf_counter() - t0)
    disp = -(-steps // s)
    print(f"steps={steps:6d} S={s:5d} dispatches={disp:3d} "
          f"compile {compile_s:6.1f}s best {best*1e3:8.2f} ms "
          f"{n*steps/best:.3e} pushes/s "
          f"({best/disp*1e3:.2f} ms/dispatch)", flush=True)
    return best


for s in (200, 500, 1000, 2000):
    timeit(2000, s)
# amortize further: more steps at the best S
for steps in (10_000, 20_000):
    timeit(steps, 2000)
