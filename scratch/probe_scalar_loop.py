"""How fast is a sequential scalar recurrence inside one Pallas kernel on
v5e? Decides whether an in-kernel Thomas (600 fwd + 600 bwd scalar steps)
can beat the 3-scan pscan (~0.1 ms/solve in the Newton loop)."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NG = 600
REPS = 200


def kern(a_ref, b_ref, out_ref):
    # forward affine recurrence x_i = a_i * x_{i-1} + b_i, scalar-sequential
    def body(i, x):
        x1 = a_ref[0, i] * x + b_ref[0, i]
        out_ref[0, i] = x1
        return x1

    jax.lax.fori_loop(0, NG, body, jnp.float32(0.0))


@jax.jit
def loop(a, b):
    def one(c, _):
        o = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, NG), jnp.float32),
        )(a, c)
        return o * 0.999, None

    c, _ = jax.lax.scan(one, b, None, length=REPS)
    return c


a = jnp.full((1, NG), 0.5, jnp.float32)
b = jnp.ones((1, NG), jnp.float32)
np.asarray(loop(a, b))
t0 = time.perf_counter()
np.asarray(loop(a, b))
el = (time.perf_counter() - t0) / REPS
print(f"sequential {NG}-step scalar recurrence in-kernel: {el*1e6:.1f} us "
      f"({el/NG*1e9:.1f} ns/step)")
