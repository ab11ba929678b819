import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np
from pypic_tpu.constants import E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON
from pypic_tpu.grid import GridSpec
from pypic_tpu import initialize as init
from pypic_tpu.parallel import domain_implicit as di
from pypic_tpu.parallel.mesh import make_mesh

density = 1e10
te = 0.1 * 11600.0
debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
grid = GridSpec(64, 15.0 * debye, "periodic")
x, v, params = init.initialize_periodic("two-stream", 16_000, density, 1, 0.05, grid, te, te, seed=2)
dt = 0.1 / params.wp

for backend in ("composed", "fused"):
    mesh = make_mesh(8, axis="slabs")
    cfg = di.DomainImplicitConfig(grid, dt, params.p2c, num_shards=8, tol=1e-8, maxiter=40, halo=5, migrate_cap=4096, backend=backend)
    st0 = di.shard_state(di.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg), mesh, cfg)
    step = jax.jit(di.make_step(cfg, mesh))
    sup = jax.jit(di.make_superstep(cfg, mesh, 4))
    s1 = st0
    ms1 = []
    for _ in range(8):
        s1, m = step(s1)
        ms1.append(m)
    s2 = st0
    ms2 = []
    for _ in range(2):
        s2, m = sup(s2)
        ms2.append(m)
    fe1 = np.array([m.field_energy for m in ms1]); fe2 = np.concatenate([np.asarray(m.field_energy) for m in ms2])
    ke1 = np.array([m.kinetic_energy for m in ms1]); ke2 = np.concatenate([np.asarray(m.kinetic_energy) for m in ms2])
    it1 = np.array([m.picard_iters for m in ms1]); it2 = np.concatenate([np.asarray(m.picard_iters) for m in ms2])
    nhc2 = np.concatenate([np.asarray(m.n_halo_clamped) for m in ms2])
    nm2 = np.concatenate([np.asarray(m.n_migrated) for m in ms2])
    print(backend, "fe rel", np.max(np.abs(fe2-fe1)/np.abs(fe1)), "ke rel", np.max(np.abs(ke2-ke1)/np.abs(ke1)),
          "iters eq", (it1==it2).all(), "nhc", nhc2.sum(), "n_mig", nm2.tolist(),
          "alive", int(np.asarray(ms2[-1].n_alive)[-1]))
    sup1 = jax.jit(di.make_superstep(cfg, mesh, 1))
    s3, m3 = sup1(st0)
    s1b, m1b = step(st0)
    pe = np.max(np.abs(np.asarray(s3.p) - np.asarray(s1b.p)))
    print(backend, "k=1 max |dp|:", pe, "fe match:", np.allclose(np.asarray(m3.field_energy)[0], np.asarray(m1b.field_energy), rtol=1e-6))
