"""Domain-decomposed implicit PIC over a device mesh.

Runs the flagship CN-Picard engine with slab-sharded fields and particles on
every visible device (set XLA_FLAGS=--xla_force_host_platform_device_count=8
with a CPU backend to try a virtual mesh), checks conservation bookkeeping,
and reports throughput.

Usage: python examples/domain_decomposed.py [n_particles]
"""

import sys
import time

import numpy as np

import jax

from pypic_tpu import GridSpec, constants as c, initialize
from pypic_tpu.parallel import domain_implicit as di
from pypic_tpu.parallel import make_mesh
from pypic_tpu.parallel.mesh import maybe_initialize_distributed
from pypic_tpu.runner import run


def main(n=400_000):
    maybe_initialize_distributed()  # multi-host if the env requests it
    n_dev = len(jax.devices())
    density, te = 1e10, 1.0 * c.EV_TO_K
    debye = np.sqrt(c.K_BOLTZMANN * te * c.EPSILON_0 / c.E_CHARGE**2 / density)
    ng = 32 * n_dev
    grid = GridSpec(ng, 4.0 * np.pi * debye * ng / 64, "periodic")
    x, v, params = initialize.initialize_periodic(
        "two-stream", n, density, 1, 0.05, grid, te, te, seed=4
    )
    cfg = di.DomainImplicitConfig(
        grid, 0.1 / params.wp, params.p2c, num_shards=n_dev,
        tol=1e-6, maxiter=40, halo=4, picard_init="extrapolate",
    )
    mesh = make_mesh(n_dev, axis="slabs")
    state = di.shard_state(
        di.init_state(x, v, -c.E_CHARGE, c.M_ELECTRON, cfg), mesh, cfg
    )
    step = di.make_step(cfg, mesh)

    steps = 200
    run(step, state, steps)  # compile + warm
    t0 = time.perf_counter()
    _, m = run(step, state, steps)
    np.asarray(m.field_energy)
    elapsed = time.perf_counter() - t0

    ee = np.asarray(m.field_energy, np.float64)
    ke = np.asarray(m.kinetic_energy, np.float64)
    tot = ee + ke
    print(f"devices: {n_dev}, particles: {n}, ng: {ng}")
    print(f"throughput: {n * steps / elapsed:.3e} pushes/s "
          f"({elapsed / steps * 1e3:.2f} ms/step)")
    print(f"field-energy growth (two-stream): {ee.max() / ee[0]:.1f}x")
    print(f"total-energy drift: {(tot[-1] - tot[0]) / tot[0]:+.2e}")
    print(f"migrated: {int(np.asarray(m.n_migrated).sum())}, "
          f"dropped: {int(np.asarray(m.n_dropped).sum())}, "
          f"halo-clamped: {int(np.asarray(m.n_halo_clamped).sum())}")
    assert int(np.asarray(m.n_dropped).sum()) == 0
    assert (np.asarray(m.n_alive) == n).all()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400_000)
