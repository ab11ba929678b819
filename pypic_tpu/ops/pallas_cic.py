"""Pallas TPU kernels for the CIC hot path.

Why these exist: the XLA lowerings of the irregular PIC memory patterns are
far from speed-of-light on TPU. Measured on a v5e chip at 1e7 particles:
``.at[].add`` scatter ~21 ms/deposit (serialized scatter), ``jnp.take``
gather ~174 ms (!), and the pure-XLA tent-matmul deposit ~28 ms because XLA
materializes the (n, 128) tent matrix through HBM (10 GB of traffic per
deposit at 1e7). The kernels here build the tent weights **in VMEM per
particle block**, so HBM traffic collapses to the particle arrays themselves
(8 bytes/particle/pass).

Formulation (shared with ops.cic._deposit_matmul): CIC weights are the tent
function max(0, 1 - |p - g|) evaluated over a 128-lane window of grid nodes;
windows stride by 127 so a particle's two cells never straddle a window
boundary. Deposit contracts the (block, 128) tent against a (block, K)
window-selector one-hot on the MXU into a (K, 128) accumulator that lives in
VMEM across the sequential TPU grid; gather is the same tent contracted the
other way against the window-folded field.

``fused_picard_iteration_*`` fuses the whole inner loop body of the implicit
engine (gather -> Crank-Nicolson -> half-step current deposit,
pypic.py:259-289) into one pass over the particles, reading (p0, v0) once
per Picard iteration and emitting only the (K, 128) current accumulator.

All kernels run in interpret mode off-TPU so the CPU test suite exercises
identical code paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
WINDOW = LANE - 1

_DEFAULT_BLOCK = 8192


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _num_windows(ng: int) -> int:
    return (ng + WINDOW - 1) // WINDOW


def _tent_and_select(p, num_k, dtype):
    """(block,) positions -> tent (block, 128), selector (block, K), both in
    registers/VMEM. Columns l of window k correspond to node 127k + l."""
    cell = jnp.floor(p)
    k = jnp.clip((cell * (1.0 / WINDOW)).astype(jnp.int32), 0, num_k - 1)
    d = p - k.astype(p.dtype) * WINDOW  # in [0, 127)
    # TPU iota must be integer-typed; cast to the compute dtype afterwards.
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1).astype(dtype)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(d[:, None] - cols))
    kids = jax.lax.broadcasted_iota(jnp.int32, (1, num_k), 1)
    sel = (k[:, None] == kids).astype(dtype)
    return tent, sel


def _fold_windows(acc, ng: int, periodic: bool):
    """(K, 128) window accumulator -> (ng,) nodes (tiny O(K*128) scatter)."""
    num_k = acc.shape[0]
    kids = jnp.arange(num_k, dtype=jnp.int32)
    g = (kids[:, None] * WINDOW + jnp.arange(LANE, dtype=jnp.int32)[None, :]).reshape(-1)
    flat = acc.reshape(-1)
    if periodic:
        g = g % ng
    else:
        flat = jnp.where(g < ng, flat, 0.0)
        g = jnp.minimum(g, ng - 1)
    return jnp.zeros((ng,), acc.dtype).at[g].add(flat)


def _window_field(field, num_k: int, periodic: bool):
    """(ng,) node field -> (K, 128) window view F_win[k, l] = F[(127k+l) % ng]."""
    ng = field.shape[0]
    kids = jnp.arange(num_k, dtype=jnp.int32)
    g = kids[:, None] * WINDOW + jnp.arange(LANE, dtype=jnp.int32)[None, :]
    if periodic:
        g = g % ng
    else:
        g = jnp.minimum(g, ng - 1)
    return field[g]


# ---------------------------------------------------------------------------
# deposit
# ---------------------------------------------------------------------------


def _deposit_kernel(p_ref, v_ref, out_ref, *, num_k):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = p_ref[0, 0, :]
    val = v_ref[0, 0, :]
    tent, sel = _tent_and_select(p, num_k, p.dtype)
    m = tent * val[:, None]
    out_ref[:] += jax.lax.dot_general(
        sel, m, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ng", "periodic", "block"))
def deposit_pallas(p, values, ng: int, *, periodic: bool, block: int = _DEFAULT_BLOCK):
    """CIC deposit via the VMEM tent kernel. Same contract as ops.cic.deposit."""
    n = p.shape[0]
    num_k = _num_windows(ng)
    pad = (-n) % block
    if pad:
        p = jnp.concatenate([p, jnp.zeros((pad,), p.dtype)])
        values = jnp.concatenate([values, jnp.zeros((pad,), values.dtype)])
    nb = p.shape[0] // block
    acc = pl.pallas_call(
        functools.partial(_deposit_kernel, num_k=num_k),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_k, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_k, LANE), jnp.float32),
        interpret=_interpret(),
    )(p.reshape(nb, 1, block), values.reshape(nb, 1, block))
    return _fold_windows(acc.astype(values.dtype), ng, periodic)


# ---------------------------------------------------------------------------
# gather
# ---------------------------------------------------------------------------


def _gather_kernel(fwin_ref, p_ref, out_ref, *, num_k):
    p = p_ref[0, 0, :]
    tent, sel = _tent_and_select(p, num_k, p.dtype)
    # (block, K) @ (K, 128) -> per-particle window row of the field.
    frows = jax.lax.dot_general(
        sel, fwin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(p.dtype)
    out_ref[0, 0, :] = jnp.sum(tent * frows, axis=1)


@functools.partial(jax.jit, static_argnames=("periodic", "block"))
def gather_pallas(field, p, *, periodic: bool, block: int = _DEFAULT_BLOCK):
    """CIC gather via the VMEM tent kernel. Same contract as ops.cic.gather."""
    ng = field.shape[0]
    n = p.shape[0]
    num_k = _num_windows(ng)
    fwin = _window_field(field, num_k, periodic)
    pad = (-n) % block
    p_pad = jnp.concatenate([p, jnp.zeros((pad,), p.dtype)]) if pad else p
    nb = p_pad.shape[0] // block
    out = pl.pallas_call(
        functools.partial(_gather_kernel, num_k=num_k),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((num_k, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 1, block), field.dtype),
        interpret=_interpret(),
    )(fwin, p_pad.reshape(nb, 1, block))
    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# fused implicit Picard iteration (periodic, single species)
# ---------------------------------------------------------------------------
#
# One Picard inner pass of the implicit engine (pypic.py:261-274) in a single
# sweep over the particle arrays: gather the smoothed field guess at the
# position guess xs, Crank-Nicolson push (p0, v0), deposit the half-step
# current jh. The reference computes j1 inside the loop too (pypic.py:279)
# but only jh feeds the field advance and the residual — j1 is needed only
# after convergence, so the fused loop body skips it and a finalize pass
# produces (p1, v1, j1) once.
#
# HBM traffic per Picard iteration: read xs, p0, v0 (12 B/particle), write
# the new xs (4 B/particle); tent/one-hot matrices and the (K, 128) current
# accumulator stay in VMEM.


def _valid_mask(i, block, n_valid, dtype):
    """Row mask zeroing deposit contributions from padding particles."""
    gid = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    return (gid < n_valid).astype(dtype)  # (block, 1) column mask


def _picard_iter_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, ph_ref, jh_ref,
    *, num_k, ng, block, n_valid,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        jh_ref[:] = jnp.zeros_like(jh_ref)

    # Runtime scalars via SMEM (avoids recompiling per (q, m, dt) tuple and
    # lets traced state feed the kernel): [qm dt, qm dt dt/dx / 2, dt/dx, w].
    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]
    w = scal_ref[3, 0]

    ps = ps_ref[0, 0, :]  # position guess xs (pypic.py:253, 293)
    p0 = p0_ref[0, 0, :]
    v0 = v0_ref[0, 0, :]

    # Gather the (pre-smoothed, window-folded) field at xs (pypic.py:261).
    tent, sel = _tent_and_select(ps, num_k, ps.dtype)
    frows = jax.lax.dot_general(
        sel, fwin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(ps.dtype)
    e_p = jnp.sum(tent * frows, axis=1)

    # Crank-Nicolson half step (pypic.py:264-272), grid coordinates.
    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    ph = 0.5 * (p0 + p1)
    ph = ph - jnp.floor(ph * (1.0 / ng)) * ng
    vh = 0.5 * (v0 + v1)
    ph_ref[0, 0, :] = ph

    tent_h, sel_h = _tent_and_select(ph, num_k, ph.dtype)
    m = tent_h * ((w * vh)[:, None] * _valid_mask(i, block, n_valid, ph.dtype))
    jh_ref[:] += jax.lax.dot_general(
        sel_h, m, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jh_ref.dtype)


def _picard_final_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, p1_ref, v1_ref, j1_ref,
    *, num_k, ng, block, n_valid,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        j1_ref[:] = jnp.zeros_like(j1_ref)

    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]
    w = scal_ref[3, 0]

    ps = ps_ref[0, 0, :]
    p0 = p0_ref[0, 0, :]
    v0 = v0_ref[0, 0, :]

    tent, sel = _tent_and_select(ps, num_k, ps.dtype)
    frows = jax.lax.dot_general(
        sel, fwin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(ps.dtype)
    e_p = jnp.sum(tent * frows, axis=1)

    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    p1 = p1 - jnp.floor(p1 * (1.0 / ng)) * ng  # pypic.py:277
    p1_ref[0, 0, :] = p1
    v1_ref[0, 0, :] = v1

    tent_1, sel_1 = _tent_and_select(p1, num_k, p1.dtype)
    m = tent_1 * ((w * v1)[:, None] * _valid_mask(i, block, n_valid, p1.dtype))
    j1_ref[:] += jax.lax.dot_general(
        sel_1, m, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(j1_ref.dtype)


def _pad_blocks(arrs, block):
    n = arrs[0].shape[0]
    pad = (-n) % block
    if pad:
        arrs = [jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) for a in arrs]
    nb = arrs[0].shape[0] // block
    return [a.reshape(nb, 1, block) for a in arrs], nb


def picard_iteration_pallas(
    field_smoothed, ps, p0, v0, ng: int,
    *, qm, w, dt: float, dx: float, block: int = _DEFAULT_BLOCK,
):
    """Fused Picard inner pass. Returns (ph, jh): the new half-step positions
    (the next iteration's gather guess) and the (ng,) half-step current."""
    num_k = _num_windows(ng)
    fwin = _window_field(field_smoothed, num_k, periodic=True)
    (ps_b, p0_b, v0_b), nb = _pad_blocks([ps, p0, v0], block)
    scal = jnp.stack(
        [qm * dt, 0.5 * qm * dt * (dt / dx), jnp.full_like(qm * dt, dt / dx), w]
    ).reshape(4, 1).astype(ps.dtype)
    kern = functools.partial(
        _picard_iter_kernel, num_k=num_k, ng=ng,
        block=block, n_valid=ps.shape[0],
    )
    ph, jh = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((num_k, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_k, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype),
            jax.ShapeDtypeStruct((num_k, LANE), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, fwin, ps_b, p0_b, v0_b)
    n = ps.shape[0]
    return ph.reshape(-1)[:n], _fold_windows(jh.astype(ps.dtype), ng, True)


def picard_finalize_pallas(
    field_smoothed, ps, p0, v0, ng: int,
    *, qm, w, dt: float, dx: float, block: int = _DEFAULT_BLOCK,
):
    """Post-convergence pass: final (p1, v1) and full-step current j1."""
    num_k = _num_windows(ng)
    fwin = _window_field(field_smoothed, num_k, periodic=True)
    (ps_b, p0_b, v0_b), nb = _pad_blocks([ps, p0, v0], block)
    scal = jnp.stack(
        [qm * dt, 0.5 * qm * dt * (dt / dx), jnp.full_like(qm * dt, dt / dx), w]
    ).reshape(4, 1).astype(ps.dtype)
    kern = functools.partial(
        _picard_final_kernel, num_k=num_k, ng=ng,
        block=block, n_valid=ps.shape[0],
    )
    p1, v1, j1 = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((num_k, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_k, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v0.dtype),
            jax.ShapeDtypeStruct((num_k, LANE), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, fwin, ps_b, p0_b, v0_b)
    n = ps.shape[0]
    return (
        p1.reshape(-1)[:n],
        v1.reshape(-1)[:n],
        _fold_windows(j1.astype(ps.dtype), ng, True),
    )
