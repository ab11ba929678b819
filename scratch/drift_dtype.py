"""Drift origin experiment: same workload/code, f32 vs f64 state on CPU."""
import os, sys, time
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from pypic_tpu.constants import E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON
from pypic_tpu.grid import GridSpec
from pypic_tpu.engines import implicit
from pypic_tpu.runner import run

n = 100_000
steps = 10_000
density, te, ng, dt = 1e5, 100.0*11600.0, 200, 1e-5
debye = np.sqrt(K_BOLTZMANN*te*EPSILON_0/E_CHARGE**2/density)
length = 22.0*debye
grid = GridSpec(ng, length, "periodic")
vth = np.sqrt(2.0*K_BOLTZMANN*te/M_ELECTRON)
kx, kv = jax.random.split(jax.random.PRNGKey(1))
x64 = jax.random.uniform(kx, (n,), jnp.float64, 0.0, length)
v64 = jax.random.normal(kv, (n,), jnp.float64) * (vth/np.sqrt(2.0))
kp = 2.0*np.pi/length
x64 = x64 + (0.8/kp)*jnp.sin(kp*x64)*0.5

for dtype, tag in ((jnp.float32, "f32"), (jnp.float64, "f64")):
    cfg = implicit.ImplicitConfig(grid, dt, length*density/n, tol=1e-9,
                                  maxiter=50, backend="composed")
    st = implicit.init_state(x64, v64, -E_CHARGE, M_ELECTRON, cfg, dtype=dtype)
    t0 = time.time()
    st2, m = run(implicit.make_step(cfg), st, steps)
    tot = np.asarray(m.field_energy, np.float64) + np.asarray(m.kinetic_energy, np.float64)
    print(f"{tag}: drift over {steps} steps = {(tot[-1]-tot[0])/tot[0]:+.3e} "
          f"(picard mean {np.asarray(m.picard_iters).mean():.1f}, {time.time()-t0:.0f}s)")
