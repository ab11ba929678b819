"""Measure the fused Picard pass at 1e8 for different tent window strides.

_choose_window minimizes width + K (lane-op model). If tent-row ops cost
more than selector columns (4w + K model), stride 8 wins at ng=200. Measure
both plus stride 24 on the real chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from pypic_tpu.ops import pallas_cic as pc

N = 100_000_000
NG = 200

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 3)
ps = jax.random.uniform(ks[0], (N,), jnp.float32, 0.0, float(NG))
v0 = jax.random.normal(ks[1], (N,), jnp.float32) * 1e5
field = jax.random.normal(ks[2], (NG,), jnp.float32)

orig = pc._choose_window

for stride, width in ((4, 8), (6, 8), (8, 16), (14, 16)):
    pc._choose_window = lambda ng, s=stride, w=width: (s, w)

    @jax.jit
    def many(field, ps, p0, v0):
        def body(i, carry):
            ph, acc = carry
            ph2, jh = pc.picard_iteration_pallas(
                field, ph, p0, v0, NG, qm=jnp.float32(-1.76e11),
                w=jnp.float32(1e-6), dt=1e-5, dx=1e-3)
            return ph2, acc + jh[0]
        ph, acc = jax.lax.fori_loop(0, 20, body, (ps, jnp.float32(0)))
        return acc

    r = many(field, ps, ps, v0)
    np.asarray(r)
    t0 = time.perf_counter()
    np.asarray(many(field, ps, ps, v0))
    el = time.perf_counter() - t0
    print(f"stride {stride}/width {width}: {el/20*1e3:.2f} ms/pass "
          f"({el/20/N*1e9:.3f} ns/particle)", flush=True)

pc._choose_window = orig
