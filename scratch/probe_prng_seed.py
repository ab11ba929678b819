"""Is pltpu.prng_seed the cost? Seed per-block vs once-per-sweep (grid
iterations run sequentially on one core, so PRNG state persists across
pl.when-gated seeding)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 16384
NB = 61
STEPS = 200
pspec = pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def u01(bits):
    mant = (bits >> 9) | jnp.uint32(1)
    return jax.lax.bitcast_convert_type(mant | jnp.uint32(0x3F800000), jnp.float32) - 1.0


def make(variant):
    def kern(seed_ref, p_ref, out_ref):
        i = pl.program_id(0)
        if variant == "seed_per_block":
            pltpu.prng_seed(seed_ref[0], i)
        elif variant == "seed_once":
            @pl.when(i == 0)
            def _():
                pltpu.prng_seed(seed_ref[0])
        elif variant == "no_seed_no_bits":
            pass
        if variant == "no_seed_no_bits":
            out_ref[0, 0, :] = p_ref[0, 0, :] + 1.0
        else:
            bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits((1, BLOCK)), jnp.uint32)
            out_ref[0, 0, :] = u01(bits)[0] + p_ref[0, 0, :]

    @jax.jit
    def loop(p):
        def body(c, _):
            o = pl.pallas_call(
                kern,
                grid=(NB,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pspec],
                out_specs=pspec,
                out_shape=jax.ShapeDtypeStruct((NB, 1, BLOCK), jnp.float32),
            )(jnp.asarray([3], jnp.uint32), c)
            return o, None
        c, _ = jax.lax.scan(body, p, None, length=STEPS)
        return c
    return loop


p0 = jnp.zeros((NB, 1, BLOCK), jnp.float32)
for v in ("no_seed_no_bits", "seed_once", "seed_per_block"):
    f = make(v)
    np.asarray(f(p0))
    t0 = time.perf_counter()
    np.asarray(f(p0))
    print(f"{v}: {(time.perf_counter()-t0)/STEPS*1e3:.3f} ms/sweep", flush=True)
