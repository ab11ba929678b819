"""Is the fused pass paying pad/slice copies when n isn't a block multiple?

N=1e8 (pad 7936 -> concat + slice per pass) vs N=6104*16384 (aligned)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from pypic_tpu.ops import pallas_cic as pc

NG = 200

for N in (100_000_000, 6104 * 16384):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    ps = jax.random.uniform(ks[0], (N,), jnp.float32, 0.0, float(NG))
    v0 = jax.random.normal(ks[1], (N,), jnp.float32) * 1e5
    field = jax.random.normal(ks[2], (NG,), jnp.float32)

    @jax.jit
    def many(field, ps, p0, v0):
        def body(i, carry):
            ph, acc = carry
            ph2, jh = pc.picard_iteration_pallas(
                field, ph, p0, v0, NG, qm=jnp.float32(-1.76e11),
                w=jnp.float32(1e-6), dt=1e-5, dx=1e-3)
            return ph2, acc + jh[0]
        _, acc = jax.lax.fori_loop(0, 20, body, (ps, jnp.float32(0)))
        return acc

    np.asarray(many(field, ps, ps, v0))
    t0 = time.perf_counter()
    np.asarray(many(field, ps, ps, v0))
    el = time.perf_counter() - t0
    print(f"N={N}: {el/20*1e3:.2f} ms/pass ({el/20/N*1e9:.3f} ns/particle)",
          flush=True)
