"""Seed-robustness of the fixed-4 + extrapolate + Anderson conserving
configs (round 3): drift per 1e4 steps on the violent headline workload."""
import sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pypic_tpu.constants import E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON
from pypic_tpu.grid import GridSpec
from pypic_tpu.engines import implicit
from pypic_tpu.runner import run

n = 1_000_000
density, te, ng, dt = 1e5, 100.0*11600.0, 200, 1e-5
debye = np.sqrt(K_BOLTZMANN*te*EPSILON_0/E_CHARGE**2/density)
length = 22.0*debye
grid = GridSpec(ng, length, "periodic")
vth = np.sqrt(2.0*K_BOLTZMANN*te/M_ELECTRON)

def drift(maxiter, accel, seed):
    kx, kv = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.uniform(kx, (n,), jnp.float32, 0.0, np.float32(length))
    v = jax.random.normal(kv, (n,), jnp.float32) * np.float32(vth/np.sqrt(2.0))
    kp = 2.0*np.pi/length
    x = x + np.float32(0.8/kp)*jnp.sin(kp*x)*0.5
    cfg = implicit.ImplicitConfig(grid, dt, length*density/n, tol=1e-30,
                                  maxiter=maxiter, picard_init="extrapolate",
                                  picard_accel=accel)
    st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
    step = implicit.make_step(cfg)
    run(step, st, 1000)  # warm
    tot0 = None; s = st; done = 0
    while done < 10000:
        s, m = run(step, s, 1000)
        tot = np.asarray(m.field_energy, np.float64) + np.asarray(m.kinetic_energy, np.float64)
        if tot0 is None: tot0 = tot[0]
        done += 1000; tot1 = tot[-1]
    print(f"fixed-{maxiter}+{accel} seed={seed}: drift {(tot1-tot0)/tot0:+.3e}",
          flush=True)

for accel in ("anderson", "anderson2"):
    for seed in (7, 3):
        drift(4, accel, seed)
