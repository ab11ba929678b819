"""Probe: Mosaic per-lane dynamic gather along sublanes (one vreg: S=8).
out[l, b] = src[idx[l, b], b]; idx.shape must equal src.shape.
S=16 fails ("Multiple source vregs along gather dimension") -> wider
windows need per-vreg gathers + select."""
import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 16384
S = 8

def kern(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)

def main(interpret):
    src = jax.random.normal(jax.random.PRNGKey(0), (S, B), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (S, B), 0, S, jnp.int32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((S, B), lambda: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((S, B), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((S, B), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
        interpret=interpret,
    )(src, idx)
    ref = jnp.take_along_axis(src, idx, axis=0)
    print("interpret" if interpret else "tpu", "max err",
          float(jnp.max(jnp.abs(out - ref))))

if __name__ == "__main__":
    main(jax.default_backend() != "tpu" or "--interp" in sys.argv)
