"""Measure Picard-pass variants that replace the gather-side tent build
with Mosaic's per-lane sublane dynamic gather (take_along_axis along
sublanes, one 8-row vreg per gather; wider windows = per-vreg gathers +
select). The win hypothesis: a wider gather stride shrinks the selector
column count K (the dominant VPU cost, ~2.2 ms/side at K=34/1e8) while the
hw gather removes the (width, B) tent build the wide window would
otherwise cost. Deposit side unchanged (scatter has no hw assist).

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site python
scratch/bench_hw_gather.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pypic_tpu.ops import pallas_cic as pc

N = 16384 * 12 if "--small" in sys.argv else 100_000_000
NG = 200
BLOCK = pc._DEFAULT_BLOCK


def gather_hw(fwin_ref, ps, num_k, block, stride, width):
    """Windowed gather via sublane dynamic gather: one-hot window select on
    the MXU as before, then F[c], F[c+1] extracted from the (width, B)
    window rows by per-lane vreg gathers instead of a tent contraction."""
    k, d = pc._window_decompose(ps, num_k, stride)
    sel_t = pc._sel_t(k, num_k, ps.dtype)  # (K, B)
    win = lax.dot_general(
        fwin_ref[:], sel_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(ps.dtype)  # (width, B)
    ri = d.astype(jnp.int32)
    frac = d - ri.astype(d.dtype)

    def vg(rows8, idx1d):
        idx = jnp.broadcast_to(idx1d[None, :], (8, rows8.shape[1]))
        return jnp.take_along_axis(rows8, idx, axis=0)[0]

    if width == 8:
        flo = vg(win, ri)
        fhi = vg(win, jnp.minimum(ri + 1, 7))
    else:
        vregs = [win[8 * i:8 * (i + 1)] for i in range(width // 8)]

        def pick(r):
            out = vg(vregs[0], jnp.clip(r, 0, 7))
            for i in range(1, len(vregs)):
                out = jnp.where(r < 8 * i, out,
                                vg(vregs[i], jnp.clip(r - 8 * i, 0, 7)))
            return out

        flo = pick(ri)
        fhi = pick(ri + 1)
    return flo * (1.0 - frac) + fhi * frac


def make_iter_kernel(gsw, dsw):
    gs, gw = gsw
    ds, dw = dsw
    gnk = pc._num_windows(NG, gs)
    dnk = pc._num_windows(NG, ds)

    def kern(scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, ph_ref, jh_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            jh_ref[:] = jnp.zeros_like(jh_ref)

        qm_dt = scal_ref[0, 0]
        qm_dt2_half = scal_ref[1, 0]
        dt_dx = scal_ref[2, 0]
        w = scal_ref[3, 0]
        ps = ps_ref[0, 0, :]
        p0 = p0_ref[0, 0, :]
        v0 = v0_ref[0, 0, :]
        e_p = gather_hw(fwin_ref, ps, gnk, BLOCK, gs, gw)
        p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
        v1 = v0 + qm_dt * e_p
        ph = 0.5 * (p0 + p1)
        ph = ph - jnp.floor(ph * (1.0 / NG)) * NG
        vh = 0.5 * (v0 + v1)
        ph_ref[0, 0, :] = ph
        pc._deposit_into(jh_ref, ph, w * vh, dnk, BLOCK, ds, dw)

    return kern, gnk, gw, dnk, dw


def iter_hw(field, ps_b, p0_b, v0_b, nb, gsw, dsw, qm, w, dt, dx):
    kern, gnk, gw, dnk, dw = make_iter_kernel(gsw, dsw)
    fwin_t = pc._window_field_t(field, gnk, True, gsw[0], gw)
    scal = pc._scalars(qm, dt, dx, w, jnp.float32)
    ph, jh = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pc._SMEM_SPEC, pc._acc_spec(gnk, gw),
                  pc._particle_spec(BLOCK), pc._particle_spec(BLOCK),
                  pc._particle_spec(BLOCK)],
        out_specs=(pc._particle_spec(BLOCK), pc._acc_spec(dnk, dw)),
        out_shape=(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((dw, dnk), jnp.float32)),
        interpret=pc._interpret(),
    )(scal, fwin_t, ps_b, p0_b, v0_b)
    return ph, pc._fold_windows(jh.T, NG, True, dsw[0])


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    ps = jax.random.uniform(ks[0], (N,), jnp.float32, 0.0, float(NG))
    v0 = jax.random.normal(ks[1], (N,), jnp.float32) * 1e5
    field = jax.random.normal(ks[2], (NG,), jnp.float32)
    (ps_b, v0_b), nb = pc.block_particles([ps, v0])
    qm = jnp.float32(-1.76e7)
    w = jnp.float32(1e-6)

    # correctness vs the production pass (tent formulation)
    ph_ref, jh_ref_ = pc.picard_iteration_pallas(
        field, ps_b, ps_b, v0_b, NG, qm=qm, w=w, dt=1e-5, dx=1e-3, n_valid=N)
    for gsw in ((6, 8), (14, 16), (30, 32)):
        ph, jh = jax.jit(iter_hw, static_argnums=(4, 5, 6))(
            field, ps_b, ps_b, v0_b, nb, gsw, (6, 8), qm, w, 1e-5, 1e-3)
        dphi = float(jnp.max(jnp.abs(ph - ph_ref)))
        djh = float(jnp.max(jnp.abs(jh - jh_ref_)) / jnp.max(jnp.abs(jh_ref_)))
        print(f"gather {gsw}: max|dph|={dphi:.2e} rel|djh|={djh:.2e}",
              flush=True)

    def time_many(fn):
        @jax.jit
        def many(field, ps_b, v0_b):
            def body(i, carry):
                ph_b, acc = carry
                ph2, jh = fn(field, ph_b, ps_b, v0_b)
                return ph2, acc + jh[0]
            _, acc = lax.fori_loop(0, 20, body, (ps_b, jnp.float32(0)))
            return acc
        np.asarray(many(field, ps_b, v0_b))
        t0 = time.perf_counter()
        np.asarray(many(field, ps_b, v0_b))
        return (time.perf_counter() - t0) / 20

    base = time_many(lambda f, psx, p0x, v0x: pc.picard_iteration_pallas(
        f, psx, p0x, v0x, NG, qm=qm, w=w, dt=1e-5, dx=1e-3, n_valid=N))
    print(f"base tent (6,8)/(6,8): {base * 1e3:.2f} ms/pass "
          f"({base / N * 1e9:.3f} ns/particle)", flush=True)
    for gsw in ((6, 8), (14, 16), (30, 32)):
        el = time_many(lambda f, psx, p0x, v0x, g=gsw: iter_hw(
            f, psx, p0x, v0x, nb, g, (6, 8), qm, w, 1e-5, 1e-3))
        print(f"hw gather {gsw}, deposit (6,8): {el * 1e3:.2f} ms/pass "
              f"({el / N * 1e9:.3f} ns/particle)", flush=True)


if __name__ == "__main__":
    main()
