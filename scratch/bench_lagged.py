import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pypic_tpu.ops.pallas_cic import picard_iteration_pallas, picard_iteration_lagged_pallas

N, NG = 100_000_000, 200
key = jax.random.PRNGKey(0)
p = jax.random.uniform(key, (N,), jnp.float32, 0.0, NG)
v = jax.random.normal(jax.random.split(key)[0], (N,), jnp.float32)
field = jnp.ones((NG,), jnp.float32)

def timeit(name, fn):
    f = jax.jit(fn)
    r = f(field, p, p, v); jax.block_until_ready(r); float(r[1].sum())
    t0 = time.perf_counter()
    r = f(field, p, p, v); float(r[1].sum())
    print(f"{name}: {(time.perf_counter()-t0)*1e3:.1f} ms/pass")

timeit("half  ", lambda f_, ps, p0, v0: picard_iteration_pallas(
    f_, ps, p0, v0, NG, qm=jnp.float32(1.0), w=jnp.float32(1.0), dt=1e-5, dx=1.0))
timeit("lagged", lambda f_, ps, p0, v0: picard_iteration_lagged_pallas(
    f_, ps, p0, v0, NG, qm=jnp.float32(1.0), w=jnp.float32(1.0), dt=1e-5, dx=1.0))
