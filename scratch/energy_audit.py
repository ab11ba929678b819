"""Per-step energy-budget audit of the composed implicit step (f64 CPU).

Conservation identity: dKE + dEE = dt*dx*<jh>*sum(eh) + mismatch(es vs eh).
Measure each term directly to find the leak."""
import os, sys
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
density, te, ng, dt = 1e5, 100.0*11600.0, 200, 1e-5
debye = np.sqrt(K_BOLTZMANN*te*EPSILON_0/E_CHARGE**2/density)
length = 22.0*debye
grid = GridSpec(ng, length, "periodic")
dx = grid.dx
vth = np.sqrt(2.0*K_BOLTZMANN*te/M_ELECTRON)
kx, kv = jax.random.split(jax.random.PRNGKey(1))
x = jax.random.uniform(kx, (n,), jnp.float64, 0.0, length)
v = jax.random.normal(kv, (n,), jnp.float64) * (vth/np.sqrt(2.0))
kp = 2.0*np.pi/length
x = x + (0.8/kp)*jnp.sin(kp*x)*0.5

p2c = length*density/n
cfg = implicit.ImplicitConfig(grid, dt, p2c, tol=1e-9, maxiter=50,
                              backend="composed")
st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg, dtype=jnp.float64)
step = implicit.make_step(cfg)

s = st
print("step  dKE+dEE        mean_term       sum_e0         resid")
for t in range(12):
    ke0 = 0.5*p2c*float(jnp.sum(s.m*s.v*s.v))
    ee0 = 0.5*EPSILON_0*dx*float(jnp.sum(s.e*s.e))
    s2, m = jax.jit(step)(s)
    ke1 = 0.5*p2c*float(jnp.sum(s2.m*s2.v*s2.v))
    ee1 = 0.5*EPSILON_0*dx*float(jnp.sum(s2.e*s2.e))
    dtot = (ke1+ee1) - (ke0+ee0)
    eh = 0.5*(np.asarray(s2.e)+np.asarray(s.e))
    mean_term = dt*dx*float(np.mean(np.asarray(s2.j)))*float(np.sum(eh))
    print(f"{t:3d}  {dtot:+.6e}  {mean_term:+.3e}  {float(jnp.sum(s.e)):+.3e}  {float(m.picard_residual):.1e}  iters={int(m.picard_iters)}  tot={ke1+ee1:.9e}")
    s = s2
