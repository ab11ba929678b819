"""bf16 tent experiment: does bf16 tent arithmetic + bf16 MXU contraction
speed up the deposit kernel on v5e?"""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
import pypic_tpu.ops.pallas_cic as pc

N = 100_000_000
NG = 200
BLOCK = 16384

key = jax.random.PRNGKey(0)
p = jax.random.uniform(key, (N,), jnp.float32, 0.0, NG)
vals = jnp.ones((N,), jnp.float32)

def bf16_deposit_kernel(p_ref, v_ref, out_ref, *, num_k, block, stride, width):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    pp = p_ref[0, 0, :]
    val = v_ref[0, 0, :]
    k, d = pc._window_decompose(pp, num_k, stride)
    rows = lax.broadcasted_iota(jnp.int32, (width, block), 0).astype(jnp.bfloat16)
    d16 = d.astype(jnp.bfloat16)
    tent = jnp.maximum(jnp.bfloat16(0), jnp.bfloat16(1) - jnp.abs(d16[None, :] - rows))
    m_t = tent * val.astype(jnp.bfloat16)[None, :]
    kid = lax.broadcasted_iota(jnp.int32, (num_k, 1), 0)
    sel_t = (k[None, :] == kid).astype(jnp.bfloat16)
    out_ref[:] += lax.dot_general(
        m_t, sel_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

@functools.partial(jax.jit, static_argnames=("ng",))
def bf16_deposit(p, values, ng):
    stride, width = pc._choose_window(ng)
    num_k = pc._num_windows(ng, stride)
    (p_b, v_b), nb = pc._pad_blocks([p, values], BLOCK)
    acc = pl.pallas_call(
        functools.partial(bf16_deposit_kernel, num_k=num_k, block=BLOCK,
                          stride=stride, width=width),
        grid=(nb,),
        in_specs=[pc._particle_spec(BLOCK), pc._particle_spec(BLOCK)],
        out_specs=pc._acc_spec(num_k, width),
        out_shape=jax.ShapeDtypeStruct((width, num_k), jnp.float32),
        interpret=pc._interpret(),
    )(p_b, v_b)
    return pc._fold_windows(acc.T.astype(values.dtype), ng, True, stride)

def timeit(name, fn):
    r = fn(); jax.block_until_ready(r); float(r.sum())
    t0 = time.perf_counter()
    for _ in range(5):
        r = fn()
    float(r.sum())
    el = (time.perf_counter()-t0)/5*1e3
    print(f"{name}: {el:.1f} ms/pass ({el/N*1e6:.3f} ns/particle)")
    return r

r32 = timeit("f32 deposit", lambda: pc.deposit_pallas(p, vals, NG, periodic=True))
r16 = timeit("bf16 deposit", lambda: bf16_deposit(p, vals, NG))
err = float(jnp.max(jnp.abs(r16 - r32)) / jnp.max(jnp.abs(r32)))
print(f"max rel diff vs f32: {err:.2e}")
