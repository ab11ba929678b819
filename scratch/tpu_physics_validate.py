"""On-TPU physics validation against the analytic rates (BASELINE.md
north-star accuracy clause). Mirrors the CPU suite's rate tests
(tests/test_engines.py) but runs on the real chip, where the arithmetic
is the production f32/Mosaic path rather than interpret mode:

  1. two-stream growth rate vs the cold-beam dispersion solution
     (implicit engine, configs[0] physics at n=2e4),
  2. Landau damping rate vs the kLD=0.5 textbook -0.153 wp
     (implicit engine, configs[1] physics at n=4e5),
  3. the verify-recipe two-stream instability drive at n=2e5
     (field-energy growth >50x, |total-energy drift| < 1e-4 over 400
     steps, reference envelope pypic.py:557-635).

Prints one PASS/FAIL line per check; exits nonzero on any FAIL.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from pypic_tpu.constants import E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON
from pypic_tpu.grid import GridSpec
from pypic_tpu import initialize as init
from pypic_tpu.engines import implicit
from pypic_tpu.runner import run

failures = []


def check(name, ok, detail):
    print(f"{'PASS' if ok else 'FAIL'} {name}: {detail}", flush=True)
    if not ok:
        failures.append(name)


def growth_rate_from_energy(ee, dt, saturation_frac=0.5):
    ee = np.asarray(ee, np.float64)
    i1 = int(np.argmax(ee > saturation_frac * ee.max()))
    i0 = max(1, i1 // 4)
    return np.log(ee[i1] / ee[i0]) / (2.0 * (i1 - i0) * dt)


print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)

# --- 1. two-stream growth vs dispersion -------------------------------
density, te = 1e10, 0.1 * 11600.0
debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
grid = GridSpec(64, 15.0 * debye, "periodic")
x, v, params = init.initialize_periodic(
    "two-stream", 20_000, density, 1, 0.05, grid, te, te, seed=2)
dt = 0.1 / params.wp
cfg = implicit.ImplicitConfig(grid, dt, params.p2c, tol=1e-3, maxiter=20)
st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
_, m = run(implicit.make_step(cfg), st, 400)
gamma = growth_rate_from_energy(m.field_energy, dt)
vte = params.v_thermal / np.sqrt(2.0)
xk = params.k * (2.0 * vte) / params.wp
g2 = np.sqrt(1.0 + 8.0 * xk * xk) / 2.0 - xk * xk - 0.5
gamma_theory = params.wp * np.sqrt(g2)
ratio = gamma / gamma_theory
check("two_stream_growth", 0.6 < ratio < 1.3,
      f"measured {gamma:.4e} vs dispersion {gamma_theory:.4e} "
      f"(ratio {ratio:.3f}, accept 0.6-1.3)")

# --- 2. Landau damping vs -0.153 wp ------------------------------------
density, te = 1e10, 1.0 * 11600.0
debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
grid = GridSpec(64, 4.0 * np.pi * debye, "periodic")
x, v, params = init.initialize_periodic(
    "landau-damping", 400_000, density, 1, 0.1, grid, te, te, seed=4)
dt = 0.1 / params.wp
cfg = implicit.ImplicitConfig(grid, dt, params.p2c, tol=1e-4, maxiter=20)
st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
_, m = run(implicit.make_step(cfg), st, 160)
ee = np.asarray(m.field_energy, np.float64)
pk = [i for i in range(2, len(ee) - 2)
      if ee[i] > ee[i - 1] and ee[i] >= ee[i + 1] and ee[i] > 5 * ee.min()]
t = np.arange(len(ee)) * dt
pk = [i for i in pk if t[i] * params.wp < 15.0]
gamma = np.polyfit(t[pk], np.log(ee[pk]), 1)[0] / 2.0 if len(pk) >= 4 else 0.0
ratio = gamma / params.growth_rate
check("landau_damping_rate", len(pk) >= 4 and 0.7 < ratio < 1.4,
      f"measured {gamma:.4e} vs analytic {params.growth_rate:.4e} "
      f"(ratio {ratio:.3f}, accept 0.7-1.4, {len(pk)} peaks)")

# --- 3. verify-recipe two-stream drive at 2e5 ---------------------------
density, te = 1e10, 0.1 * 11600.0
debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
grid = GridSpec(64, 15.0 * debye, "periodic")
x, v, params = init.initialize_periodic(
    "two-stream", 200_000, density, 1, 0.05, grid, te, te, seed=2)
cfg = implicit.ImplicitConfig(grid, 0.1 / params.wp, params.p2c,
                              tol=1e-8, maxiter=50)
st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
_, m = run(implicit.make_step(cfg), st, 400)
ee = np.asarray(m.field_energy, np.float64)
tot = ee + np.asarray(m.kinetic_energy, np.float64)
growth = ee.max() / ee[0]
drift = abs(tot[-1] - tot[0]) / tot[0]
picard = float(np.asarray(m.picard_iters, np.float64).mean())
check("verify_recipe_drive", growth > 50.0 and drift < 1e-4,
      f"field-energy growth x{growth:.0f} (>50), |drift| {drift:.2e} "
      f"(<1e-4), picard mean {picard:.1f}")

sys.exit(1 if failures else 0)
