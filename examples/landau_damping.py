"""Landau damping: run the flagship implicit engine at kLD = 0.5 and check
the measured damping rate against the analytic value.

Usage: python examples/landau_damping.py [n_particles]
"""

import sys

import numpy as np

from pypic_tpu import GridSpec, constants as c, diagnostics, initialize
from pypic_tpu.engines import implicit
from pypic_tpu.runner import run


def main(n=400_000):
    density, te = 1e10, 1.0 * c.EV_TO_K
    debye = np.sqrt(c.K_BOLTZMANN * te * c.EPSILON_0 / c.E_CHARGE**2 / density)
    grid = GridSpec(64, 4.0 * np.pi * debye, "periodic")  # k LD = 0.5
    x, v, params = initialize.initialize_periodic(
        "landau-damping", n, density, 1, 0.1, grid, te, te, seed=4
    )
    dt = 0.1 / params.wp
    cfg = implicit.ImplicitConfig(grid, dt, params.p2c, tol=1e-4, maxiter=20)
    state = implicit.init_state(x, v, -c.E_CHARGE, c.M_ELECTRON, cfg)
    _, metrics = run(implicit.make_step(cfg), state, 160)

    gamma = diagnostics.damping_rate_from_peaks(
        np.asarray(metrics.field_energy), dt, t_max=15.0 / params.wp
    )
    print(f"measured gamma/wp = {gamma / params.wp:+.4f}")
    print(f"analytic gamma/wp = {params.growth_rate / params.wp:+.4f}")
    print(f"ratio             = {gamma / params.growth_rate:.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400_000)
