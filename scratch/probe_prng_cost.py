"""Attribute the sheath_reinject_pallas kernel cost on v5e: PRNG bits vs
Box-Muller transcendentals vs operand/HBM traffic. Each variant runs 200
sweeps over 61 blocks of 16384 inside one jit dispatch."""
import sys, time, functools
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


def make(variant, ndraw=5):
    def kern(seed_ref, p_ref, out_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        if variant == "bits_only":
            bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits((1, BLOCK)), jnp.uint32)
            out_ref[0, 0, :] = u01(bits)[0] + p_ref[0, 0, :]
        elif variant == "bits5":
            bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits((ndraw, BLOCK)), jnp.uint32)
            u = u01(bits)
            out_ref[0, 0, :] = sum(u[i] for i in range(ndraw)) + p_ref[0, 0, :]
        elif variant == "bm":
            bits = jax.lax.bitcast_convert_type(pltpu.prng_random_bits((ndraw, BLOCK)), jnp.uint32)
            u = u01(bits)
            r0 = jnp.sqrt(-2.0 * jnp.log(u[0]))
            t0 = jnp.float32(6.2831853) * u[1]
            r1 = jnp.sqrt(-2.0 * jnp.log(u[2]))
            t1 = jnp.float32(6.2831853) * u[3]
            z = r0 * jnp.cos(t0) + r0 * jnp.sin(t0) + r1 * jnp.cos(t1)
            out_ref[0, 0, :] = z + u[4] + p_ref[0, 0, :]
        return

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
for v in ("bits_only", "bits5", "bm"):
    f = make(v)
    np.asarray(f(p0))
    t0 = time.perf_counter()
    np.asarray(f(p0))
    print(f"{v}: {(time.perf_counter()-t0)/STEPS*1e3:.3f} ms/sweep", flush=True)
