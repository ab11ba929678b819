"""A/B the shared-window fused Picard pass vs separate windows on the
conserving headline config (1e8 block-aligned, ng=200, fixed-4 + anderson +
extrapolate) in one session."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
import jax.numpy as jnp
from pypic_tpu.constants import E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON
from pypic_tpu.grid import GridSpec
from pypic_tpu.engines import implicit
from pypic_tpu.runner import run

STEPS = 50
n, ng = 6104 * 16384, 200
# the bench headline workload (bench.py _landau_problem, pypic.py:846-855)
density = 1e5
te = 100.0 * 11600.0
dt = 1e-5
debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
length = 22.0 * debye
grid = GridSpec(ng, length, "periodic")
p2c = length * density / n
vth = np.sqrt(2.0 * K_BOLTZMANN * te / M_ELECTRON)
kx, kv = jax.random.split(jax.random.PRNGKey(1))
x = jax.random.uniform(kx, (n,), jnp.float32, 0.0, np.float32(length))
v = jax.random.normal(kv, (n,), jnp.float32) * np.float32(vth / np.sqrt(2.0))
k_pert = 2.0 * np.pi / length
x = x + np.float32(0.8 / k_pert) * jnp.sin(k_pert * x) * 0.5

for mode in ("separate", "shared", "separate", "shared"):
    cfg = implicit.ImplicitConfig(
        grid, dt, p2c, tol=1e-30, maxiter=4, backend="fused",
        picard_init="extrapolate", picard_accel="anderson",
        window_share=mode,
    )
    st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
    step = implicit.make_step(cfg)
    def go():
        _, m = run(step, st, STEPS)
        np.asarray(m.field_energy)
        return m
    go()
    t0 = time.perf_counter(); m = go()
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    ncl = int(np.asarray(m.picard_clamped).sum())
    print(f"{mode}: {ms:.2f} ms/step -> {n/ms*1e3:.3e} pushes/s "
          f"(clamped {ncl})", flush=True)
