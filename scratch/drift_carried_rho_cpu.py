"""CPU f32 drift A/B for the carried-rho explicit domain cycle (round 3e).

carried_rho='on' is trajectory-equivalence-tested against the composed
domain step over short horizons (tests/test_domain.py); this measures the
1e4-step energy drift of BOTH on the canonical violent workload
(perturbation-0.8 Landau, explicit leapfrog, 8 slab shards) at n=65536 on
CPU (interpret-mode kernel for carried — same f32 arithmetic class as TPU;
PERF.md's f32 CPU control matched the TPU drift band). If carried lands in
the same drift band as composed, the remaining TPU A/B is about SPEED only.

Usage: python scratch/drift_carried_rho_cpu.py {composed|carried} SEED
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from pypic_tpu import GridSpec, constants as c, initialize  # noqa: E402
from pypic_tpu.parallel import domain as dom  # noqa: E402
from pypic_tpu.parallel.mesh import make_mesh  # noqa: E402
from pypic_tpu.runner import run  # noqa: E402

mode, seed = sys.argv[1], int(sys.argv[2])
n, steps, chunk = 65536, 10_000, 500
dt = 1e-6  # wp*dt = 0.018: at the implicit bench's dt=1e-5 (wp*dt=0.18)
# explicit leapfrog noise-heats ~7x per 1000 steps even at ZERO
# perturbation (dt^2-scaling integrator error, measured) — the A/B needs
# the scheme near-conservative so a carried-deposit bias would show

density, te = 1e5, 100.0 * 11600.0  # pypic.py:846-855 canonical preset
debye = np.sqrt(c.K_BOLTZMANN * te * c.EPSILON_0 / c.E_CHARGE**2 / density)
grid = GridSpec(200, 22.0 * debye, "periodic")
# perturbation 0.1, NOT the violent 0.8: explicit leapfrog heats
# violently on 0.8 regardless of deposit scheduling (composed +1.55 vs
# carried +1.55 at 500 steps — indistinguishable because the workload
# itself blows up), so the discriminating A/B needs a workload where the
# scheme stays near-conservative over the full horizon
x, v, p = initialize.initialize_periodic(
    "landau-damping", n, density, 1, 0.1, grid, te, te, seed=seed)
sigma_cells = float(np.asarray(v).std()) * dt / grid.dx
halo = max(4, int(np.ceil(8.0 * sigma_cells))) if mode == "carried" else 0
cfg = dom.DomainConfig(
    grid, dt, p.p2c, num_shards=8, halo=halo, migrate_cap=65536,
    carried_rho="on" if mode == "carried" else "off")
mesh = make_mesh(8, axis="slabs")
st = dom.shard_state(
    dom.init_state(x, v, -c.E_CHARGE, c.M_ELECTRON, cfg,
                   capacity_factor=4.0), mesh, cfg)
step = dom.make_step(cfg, mesh)

tot0 = None
clamped = dropped = 0
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
    clamped += int(np.asarray(m.n_halo_clamped).sum())
    dropped += int(np.asarray(m.n_dropped).sum())
    print(f"{mode} seed={seed} step {done}: drift "
          f"{(tot[-1] - tot0) / tot0:+.3e} clamped={clamped} "
          f"dropped={dropped} ({time.time() - t0:.0f}s)", flush=True)
print(f"FINAL {mode} seed={seed}: drift/1e4 "
      f"{(tot[-1] - tot0) / tot0:+.3e} clamped={clamped} dropped={dropped}")
