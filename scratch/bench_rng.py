import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1_000_000
def timeit(name, fn):
    f = jax.jit(fn)
    r = f(jax.random.PRNGKey(0)); jax.block_until_ready(r); float(r)
    t0 = time.perf_counter(); float(f(jax.random.PRNGKey(1)))
    print(f"{name}: {(time.perf_counter()-t0)/50*1e3:.3f} ms/pass")

def make(impl):
    def fn(key):
        data = jax.random.key_data(key)
        if impl == "rbg":
            k = jax.random.wrap_key_data(jnp.tile(data, 2), impl="rbg")
        else:
            k = jax.random.wrap_key_data(data, impl="threefry2x32")
        def body(i, acc):
            kk = jax.random.fold_in(k, i)
            x = jax.random.normal(jax.random.split(kk)[0], (N,), jnp.float32)
            v = jax.random.normal(jax.random.split(kk)[1], (N, 3), jnp.float32)
            return acc + x.sum() + v.sum()
        return lax.fori_loop(0, 50, body, jnp.float32(0))
    return fn

timeit("threefry 4e6 normals", make("threefry"))
timeit("rbg      4e6 normals", make("rbg"))
