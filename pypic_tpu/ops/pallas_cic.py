"""Pallas TPU kernels for the CIC hot path.

Why these exist: the XLA lowerings of the irregular PIC memory patterns are
far from speed-of-light on TPU. Measured on a v5e chip at 1e7 particles:
``.at[].add`` scatter ~21 ms/deposit (serialized scatter), ``jnp.take``
gather ~174 ms, and the pure-XLA tent-matmul deposit ~28 ms because XLA
materializes the tent matrix through HBM. The kernels here build the tent
weights **in VMEM per particle block**, so HBM traffic collapses to the
particle arrays themselves (4-16 bytes/particle/pass).

Formulation: CIC weights are the tent function max(0, 1 - |p - g|) evaluated
over a narrow node window; windows start every ``stride`` nodes and the tent
spans ``width >= stride + 2`` rows so a particle's two nodes never leave its
window (``_choose_window`` minimizes a measured-cost mix of tent rows and
selector columns per grid size — e.g. ng=200 -> stride 6 / width 8 / 34
windows). Layout is **transposed** — window columns live on
sublanes and particles on lanes — so every elementwise op keeps the particle
arrays in their natural lanes-major layout and Mosaic inserts no
lane<->sublane relayouts (the row-major formulation measured ~1.9 ns/particle
per deposit on v5e; this one ~0.72 ns):

* deposit: W^T (128, K) += m_T (128, B) @ sel (B, K) on the MXU, with the
  window accumulator resident in VMEM across the sequential grid and folded
  onto the ng nodes once at the end;
* gather: frows_T (128, B) = fwin_T (128, K) @ sel_T (K, B), then
  e_p = ones(1,128) @ (tent_T * frows_T) — both contractions MXU-native.

``picard_iteration_pallas`` / ``picard_finalize_pallas`` fuse the whole inner
loop body of the implicit engine (gather -> Crank-Nicolson -> half-step
current deposit, pypic.py:259-289) into one sweep over the particle arrays
per Picard iteration; only jh feeds the field advance and the residual
(pypic.py:283-289), so j1/p1/v1 come from a single finalize pass after
convergence. Runtime scalars (q/m, dt factors) ride in SMEM so traced state
feeds the kernels without recompiles.

All kernels run in interpret mode off-TPU so the CPU test suite exercises
identical code paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPSILON_0 as _EPSILON_0

LANE = 128

_DEFAULT_BLOCK = 16384


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _choose_window(ng: int):
    """Pick (stride, width): windows start every ``stride`` nodes and the
    tent spans ``width`` sublane rows (width >= stride + 2 so a particle's
    two nodes never leave its window; width a multiple of 8 for tiling).
    For a given width the largest legal stride (width - 2) always wins —
    it minimizes the window count K = ceil(ng/stride).

    Cost model calibrated on v5e at 1e8 particles/ng=200
    (scratch/bench_window_stride.py): per-pass time fits
    ~0.37 ms/tent-row + ~0.13 ms/selector-column on top of a ~6.8 ms
    fixed HBM-stream floor, so minimize 3*width + K. The tent rows cost
    ~3x the selector columns because the tent build is a ~4-op elementwise
    chain per row while the selector is a 2-op compare-cast; measured
    ng=200 -> stride 6 / width 8 / K=34 at 14.1 ms/pass vs 16.5 for the
    old width+K model's stride 16 / width 24 (and 130+ for the naive
    (127, 128) single window).
    """
    best = None
    for width in (8, 16, 24, 32, 48, 64, 96, 128):
        stride = width - 2
        num_k = (ng - 1) // stride + 1
        cost = 3 * width + num_k
        if best is None or cost < best[2]:
            best = (stride, width, cost)
    return best[0], best[1]


def _num_windows(ng: int, stride: int) -> int:
    return (ng - 1) // stride + 1


def _choose_window_sw(ng: int):
    """Shared-window geometry: windows keep a one-row margin on EACH side
    of the gather span (stride = width - 4, frame offset +1) so the
    deposit's tent — built at the gather position plus the iterate's
    nearest-image displacement — lands inside the SAME ``width`` sublane
    rows whenever |displacement| <= 1 grid cell (larger excursions are
    clamped and counted). This keeps the deposit tent at the gather
    tent's row count: the round-3 pad=2 shared pass paid a 12-row deposit
    tent (Mosaic-tiled to 16) and measured 27% SLOWER than separate on
    v5e; the frame-shifted form trades that for a denser window set.

    Cost model: the v5e A/B at ng=200 (scratch/sw_frame_ab.log) showed the
    per-pass cost is K-dominated for this kernel — it runs ONE selector
    but THREE K-contracting dots (gather, deposit, clamp row) vs the
    separate pass's two, so small-stride geometries lose. Weight K at 2x
    the separate fit: minimize ``3*width + 2*K``
    (ng=200 -> stride 12 / width 16 / K=17)."""
    best = None
    for width in (8, 16, 24, 32, 48, 64, 96, 128):
        stride = width - 4
        if stride < 1:
            continue
        num_k = (ng - 1) // stride + 1
        cost = 3 * width + 2 * num_k
        if best is None or cost < best[2]:
            best = (stride, width, cost)
    return best[0], best[1]


def _window_decompose(p, num_k, stride):
    """(B,) positions -> (window id k (B,) int32, in-window offset d (B,))."""
    cell = jnp.floor(p)
    k = jnp.clip((cell * (1.0 / stride)).astype(jnp.int32), 0, num_k - 1)
    d = p - k.astype(p.dtype) * stride  # in [0, stride + 1)
    return k, d


def _tent_t(d, block, width):
    """Transposed tent (width, B): row l = weight for node (stride k + l)."""
    rows = lax.broadcasted_iota(jnp.int32, (width, block), 0).astype(d.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(d[None, :] - rows))


def _sel_t(k, num_k, dtype):
    """(K, B) window one-hot (k stays lanes-major; no relayout).

    The int8-packed variant (4x denser VPU compares) is IMPOSSIBLE on
    v5e: i8 iota has no Mosaic lowering, and an i32-built-then-cast i8
    compare dies in the backend with "Target does not support this
    comparison" (scratch/sel_int8_ab.py, round 4) — consistent with the
    round-3 findings that the VPU has no native u32 multiply and bf16
    elementwise chains convert rather than pack. The i32 compare + f32
    cast below is the hardware floor for this construction."""
    kid = lax.broadcasted_iota(jnp.int32, (num_k, 1), 0)
    return (k[None, :] == kid).astype(dtype)


def _fold_windows(acc, ng: int, periodic: bool, stride: int,
                  row_offset: int = 0):
    """(K, width) window accumulator -> (ng,) nodes (tiny O(K*width)
    scatter; overlapping window rows fold additively). ``row_offset``
    shifts the node of row l to stride*k + l + row_offset (the
    shared-window deposit pads tent rows below the window base)."""
    num_k, width = acc.shape
    kids = jnp.arange(num_k, dtype=jnp.int32)
    g = (kids[:, None] * stride + jnp.arange(width, dtype=jnp.int32)[None, :]
         + row_offset).reshape(-1)
    flat = acc.reshape(-1)
    if periodic:
        g = g % ng  # negative offsets wrap too (jnp mod semantics)
    else:
        flat = jnp.where((g >= 0) & (g < ng), flat, 0.0)
        g = jnp.clip(g, 0, ng - 1)
    return jnp.zeros((ng,), acc.dtype).at[g].add(flat)


def _window_field_t(field, num_k: int, periodic: bool, stride: int, width: int,
                    off: int = 0):
    """(ng,) node field -> transposed window view (width, K):
    fwin_T[l, k] = F[(stride k + l - off) % ng]. ``off`` is the
    shared-window frame shift (row 0 sits one node BELOW the window base
    so the deposit tent has a margin row on each side); out-of-range rows
    in the bounded form are edge-clamped — they carry zero tent weight
    for any in-range position."""
    ng = field.shape[0]
    kids = jnp.arange(num_k, dtype=jnp.int32)
    g = (jnp.arange(width, dtype=jnp.int32)[:, None] - off
         + kids[None, :] * stride)
    if periodic:
        g = g % ng
    else:
        g = jnp.clip(g, 0, ng - 1)
    return field[g]


def _pad_blocks(arrs, block):
    n = arrs[0].shape[0]
    pad = (-n) % block
    if pad:
        arrs = [jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) for a in arrs]
    nb = arrs[0].shape[0] // block
    return [a.reshape(nb, 1, block) for a in arrs], nb


def block_particles(arrs, block: int = _DEFAULT_BLOCK):
    """Pad + reshape (n,) particle arrays into the kernels' blocked
    (nb, 1, block) layout. The Picard wrappers accept either layout;
    pre-blocking loop-carried arrays once per step skips the pad-concat +
    slice-back copies the (n,) path pays on every pass when n is not a
    block multiple (measured ~4 ms/pass at 1e8 on v5e — 14.4 vs 10.4 ms).
    Returns (blocked_list, nb)."""
    return _pad_blocks(arrs, block)


def unblock_particles(a, n: int):
    """Inverse of block_particles for one array: (nb, 1, block) -> (n,)."""
    return a.reshape(-1)[:n]


def _as_blocks(arrs, block, n_valid=None):
    """Accept (n,) or pre-blocked (nb, 1, block) particle arrays uniformly.
    Returns (blocked_list, nb, n_valid, was_blocked); n_valid is required
    with pre-blocked inputs (the pad tail is indistinguishable from data)."""
    if arrs[0].ndim == 3:
        if n_valid is None:
            raise ValueError("n_valid is required for pre-blocked inputs")
        if arrs[0].shape[1:] != (1, block):
            raise ValueError(
                f"pre-blocked inputs have layout {arrs[0].shape} but this "
                f"call uses block={block}; pass the same block to "
                "block_particles and the kernel wrapper"
            )
        return list(arrs), arrs[0].shape[0], n_valid, True
    if n_valid is None:
        n_valid = arrs[0].shape[0]
    bs, nb = _pad_blocks(arrs, block)
    return bs, nb, n_valid, False


def _particle_spec(block):
    return pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _acc_spec(num_k, width):
    return pl.BlockSpec((width, num_k), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _lane_mask(i, block, n_valid, dtype):
    """(B,) lanes-major validity mask zeroing padding particles."""
    gid = i * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)[0]
    return (gid < n_valid).astype(dtype)


# ---------------------------------------------------------------------------
# deposit
# ---------------------------------------------------------------------------


def _deposit_kernel(p_ref, v_ref, out_ref, *, num_k, block, stride, width):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = p_ref[0, 0, :]
    val = v_ref[0, 0, :]
    k, d = _window_decompose(p, num_k, stride)
    m_t = _tent_t(d, block, width) * val[None, :]  # (width, B)
    # NT contraction over lanes of both operands: building the selector as
    # (K, B) keeps k lanes-major — the (B, K) form costs a Mosaic relayout
    # measured at ~0.5 ns/particle (3x the rest of the kernel combined).
    sel_t = _sel_t(k, num_k, p.dtype)  # (K, B)
    out_ref[:] += lax.dot_general(
        m_t, sel_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ng", "periodic", "block"))
def deposit_pallas(p, values, ng: int, *, periodic: bool, block: int = _DEFAULT_BLOCK):
    """CIC deposit via the VMEM tent kernel. Same contract as ops.cic.deposit
    (inactive particles are masked by zero values)."""
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    (p_b, v_b), nb = _pad_blocks([p, values], block)
    acc = pl.pallas_call(
        functools.partial(_deposit_kernel, num_k=num_k, block=block,
                          stride=stride, width=width),
        grid=(nb,),
        in_specs=[_particle_spec(block), _particle_spec(block)],
        out_specs=_acc_spec(num_k, width),
        out_shape=jax.ShapeDtypeStruct((width, num_k), jnp.float32),
        interpret=_interpret(),
    )(p_b, v_b)
    return _fold_windows(acc.T.astype(values.dtype), ng, periodic, stride)


def _deposit2_kernel(p_ref, va_ref, vb_ref, a_ref, b_ref,
                     *, num_k, block, stride, width):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    p = p_ref[0, 0, :]
    k, d = _window_decompose(p, num_k, stride)
    tent = _tent_t(d, block, width)  # built ONCE for both deposits
    sel_t = _sel_t(k, num_k, p.dtype)
    a_ref[:] += lax.dot_general(
        tent * va_ref[0, 0, :][None, :], sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(a_ref.dtype)
    b_ref[:] += lax.dot_general(
        tent * vb_ref[0, 0, :][None, :], sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(b_ref.dtype)


@functools.partial(jax.jit, static_argnames=("ng", "periodic", "block"))
def deposit2_pallas(p, va, vb, ng: int, *, periodic: bool,
                    block: int = _DEFAULT_BLOCK):
    """Two CIC deposits sharing one particle sweep and one tent build —
    the rho + number-density pair of the Boltzmann weighting
    (pygcpic.py:841-905) costs barely more than one deposit."""
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    (p_b, va_b, vb_b), nb = _pad_blocks([p, va, vb], block)
    a, b = pl.pallas_call(
        functools.partial(_deposit2_kernel, num_k=num_k, block=block,
                          stride=stride, width=width),
        grid=(nb,),
        in_specs=[_particle_spec(block)] * 3,
        out_specs=(_acc_spec(num_k, width), _acc_spec(num_k, width)),
        out_shape=(
            jax.ShapeDtypeStruct((width, num_k), jnp.float32),
            jax.ShapeDtypeStruct((width, num_k), jnp.float32),
        ),
        interpret=_interpret(),
    )(p_b, va_b, vb_b)
    return (
        _fold_windows(a.T.astype(va.dtype), ng, periodic, stride),
        _fold_windows(b.T.astype(vb.dtype), ng, periodic, stride),
    )


def _boris_kernel(
    fwin_ref, p_ref, vx_ref, vy_ref, vz_ref, c_ref, act_ref,
    p1_ref, vx1_ref, vy1_ref, vz1_ref,
    *, num_k, block, stride, width, bx, by, bz, dt, dt_dx, hi, swap,
):
    p = p_ref[0, 0, :]
    vx0 = vx_ref[0, 0, :]
    vy0 = vy_ref[0, 0, :]
    vz0 = vz_ref[0, 0, :]
    const = c_ref[0, 0, :]
    act = act_ref[0, 0, :]

    pc = jnp.clip(p, 0.0, hi)
    if swap:
        # reference quirk (pygcpic.py:343-347): swapped intra-cell gather
        # weights — the in-kernel form of engines.magnetized.
        # mirror_gather_position (keep the algebra in sync with it)
        pc = jnp.clip(2.0 * jnp.floor(pc) + 1.0 - pc, 0.0, hi)
    ex = _gather_at(fwin_ref, pc, num_k, block, stride, width)
    # Boris-Buneman: half E kick, (t, s) rotation, half E kick, drift
    # (pygcpic.py:460-507; E has only an x component on the 1D grid).
    vx = vx0 + const * ex
    tx = const * bx
    ty = const * by
    tz = const * bz
    t2 = tx * tx + ty * ty + tz * tz
    inv = 2.0 / (1.0 + t2)
    sx = tx * inv
    sy = ty * inv
    sz = tz * inv
    vfx = vx + vy0 * tz - vz0 * ty
    vfy = vy0 + vz0 * tx - vx * tz
    vfz = vz0 + vx * ty - vy0 * tx
    vx = vx + (vfy * sz - vfz * sy)
    vy = vy0 + (vfz * sx - vfx * sz)
    vz = vz0 + (vfx * sy - vfy * sx)
    vx = vx + const * ex

    # inactive particles hold their state (the engine's where-masks)
    p1_ref[0, 0, :] = jnp.where(act > 0, p + vx * dt_dx, p)
    vx1_ref[0, 0, :] = jnp.where(act > 0, vx, vx0)
    vy1_ref[0, 0, :] = jnp.where(act > 0, vy, vy0)
    vz1_ref[0, 0, :] = jnp.where(act > 0, vz, vz0)


@functools.partial(
    jax.jit, static_argnames=("b", "dt", "dt_dx", "block", "swap_weights")
)
def boris_gather_push_pallas(
    field, p, vx, vy, vz, const, act, *, b, dt: float, dt_dx: float,
    block: int = _DEFAULT_BLOCK, swap_weights: bool = False,
):
    """Fused bounded CIC gather + Boris-Buneman push (one particle sweep).

    Args:
        field: (ng,) E_x on the bounded grid.
        p: (n,) positions in grid coordinates.
        vx/vy/vz: (n,) velocity components [m/s].
        const: (n,) 0.5 dt e charge_state / m (zero for inactive is NOT
            enough to freeze a particle — pass ``act``).
        act: (n,) 1.0 for active particles, 0.0 to hold state.
        b: static (bx, by, bz) tuple [T].
        dt / dt_dx: timestep and dt/dx (static).

    Returns (p1, vx1, vy1, vz1).
    """
    ng = field.shape[0]
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(field, num_k, False, stride, width)
    (p_b, vx_b, vy_b, vz_b, c_b, a_b), nb = _pad_blocks(
        [p, vx, vy, vz, const, act], block
    )
    kern = functools.partial(
        _boris_kernel, num_k=num_k, block=block, stride=stride, width=width,
        bx=float(b[0]), by=float(b[1]), bz=float(b[2]),
        dt=dt, dt_dx=dt_dx, hi=float(ng - 1), swap=bool(swap_weights),
    )
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[_acc_spec(num_k, width)] + [_particle_spec(block)] * 6,
        out_specs=(_particle_spec(block),) * 4,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb, 1, block), p.dtype) for _ in range(4)
        ),
        interpret=_interpret(),
    )(fwin_t, p_b, vx_b, vy_b, vz_b, c_b, a_b)
    n = p.shape[0]
    return tuple(o.reshape(-1)[:n] for o in outs)


def _boris_deposit_kernel(
    fwin_ref, p_ref, vx_ref, vy_ref, vz_ref, c_ref, act_ref, wr_ref, wn_ref,
    p1_ref, vx1_ref, vy1_ref, vz1_ref, rho_ref, n_ref,
    *, num_k, block, stride, width, pad, bx, by, bz, dt, dt_dx, hi, swap,
):
    """Boris push + carried dual deposit sharing ONE window decomposition.

    The deposit that opens the NEXT magnetized step (rho + number density
    over the next step's active particles at their new positions,
    pygcpic.py:841-905) rides this step's push sweep: the kernel deposits
    each surviving particle's tent at p1 inside the window selected for the
    GATHER at p, widened by ``pad`` rows on each side (the per-step ion
    displacement is a fraction of a cell — PERF.md round-4 lead). Rows
    whose p1 leaves [0, hi] (this step's wall hits — they deactivate and
    must not weight next step's grid) deposit nothing; the engine patches
    the post-push mutations (ionization charge deltas, re-activated slots)
    with small packed deposits. Deposits clamped at the widened window edge
    are counted into rho's extra accumulator row so a silent charge
    misplacement is impossible (same contract as _picard_iter_sw_kernel).
    """
    wp = width + 2 * pad
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        rho_ref[:] = jnp.zeros_like(rho_ref)
        n_ref[:] = jnp.zeros_like(n_ref)

    p = p_ref[0, 0, :]
    vx0 = vx_ref[0, 0, :]
    vy0 = vy_ref[0, 0, :]
    vz0 = vz_ref[0, 0, :]
    const = c_ref[0, 0, :]
    act = act_ref[0, 0, :]

    # one decomposition + selector for the gather AND the deposit (this
    # kernel keeps the pad-widened deposit geometry, so no frame shift)
    pc = jnp.clip(p, 0.0, hi)
    if swap:
        # reference quirk (pygcpic.py:343-347): gather at the cell-mirrored
        # position — the in-kernel form of engines.magnetized.
        # mirror_gather_position (keep the algebra in sync with it). The
        # deposit below is expressed relative to pc so it keeps the
        # reference's CORRECT weights (pygcpic.py:858-864).
        pc = jnp.clip(2.0 * jnp.floor(pc) + 1.0 - pc, 0.0, hi)
    sel_t, d_s, ex = _shared_gather(fwin_ref, pc, num_k, stride, block,
                                    width, frame_shift=False)

    # Boris-Buneman (pygcpic.py:460-507) — identical to _boris_kernel
    vx = vx0 + const * ex
    tx = const * bx
    ty = const * by
    tz = const * bz
    t2 = tx * tx + ty * ty + tz * tz
    inv = 2.0 / (1.0 + t2)
    sx = tx * inv
    sy = ty * inv
    sz = tz * inv
    vfx = vx + vy0 * tz - vz0 * ty
    vfy = vy0 + vz0 * tx - vx * tz
    vfz = vz0 + vx * ty - vy0 * tx
    vx = vx + (vfy * sz - vfz * sy)
    vy = vy0 + (vfz * sx - vfx * sz)
    vz = vz0 + (vfx * sy - vfy * sx)
    vx = vx + const * ex

    p1 = jnp.where(act > 0, p + vx * dt_dx, p)
    p1_ref[0, 0, :] = p1
    vx1_ref[0, 0, :] = jnp.where(act > 0, vx, vx0)
    vy1_ref[0, 0, :] = jnp.where(act > 0, vy, vy0)
    vz1_ref[0, 0, :] = jnp.where(act > 0, vz, vz0)

    # carried deposit: rows surviving this step's wall check weight the
    # next step's grid at p1 (weights arrive pre-masked: zero for inactive
    # slots; ``live`` additionally zeroes this step's wall hits)
    live = ((p1 >= 0.0) & (p1 <= hi)).astype(p.dtype)
    wr = wr_ref[0, 0, :] * live
    wn = wn_ref[0, 0, :] * live
    d_h = d_s + (p1 - pc) + pad
    oob = (((d_h < 0.0) | (d_h > wp - 1.0)) & (wn > 0.0)).astype(p.dtype)
    d_h = jnp.clip(d_h, 0.0, wp - 1.0)
    tent_h = _tent_t(d_h, block, wp)  # (wp, B)
    contrib_r = lax.dot_general(
        tent_h * wr[None, :], sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    clamp_row = lax.dot_general(
        oob[None, :], sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rho_ref[:] += jnp.concatenate([contrib_r, clamp_row], axis=0).astype(
        rho_ref.dtype
    )
    n_ref[:] += lax.dot_general(
        tent_h * wn[None, :], sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(n_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("b", "dt", "dt_dx", "block", "pad",
                              "swap_weights")
)
def boris_gather_push_deposit_pallas(
    field, p, vx, vy, vz, const, act, wr, wn, *, b, dt: float, dt_dx: float,
    block: int = _DEFAULT_BLOCK, pad: int = 2, swap_weights: bool = False,
):
    """Fused bounded gather + Boris push + carried dual deposit.

    Same contract as boris_gather_push_pallas plus: ``wr``/``wn`` are the
    per-particle rho / number-density deposit weights of the NEXT step
    (zero for inactive slots); the kernel deposits them at p1 for rows
    that survive the wall check, sharing the gather's window decomposition
    (deposit offsets beyond ``pad`` cells clamp at the widened window edge
    and are counted — assert the count stays 0).

    Returns (p1, vx1, vy1, vz1, rho, n_dens, n_clamped).
    """
    ng = field.shape[0]
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    wp = width + 2 * pad
    fwin_t = _window_field_t(field, num_k, False, stride, width)
    (p_b, vx_b, vy_b, vz_b, c_b, a_b, wr_b, wn_b), nb = _pad_blocks(
        [p, vx, vy, vz, const, act, wr, wn], block
    )
    kern = functools.partial(
        _boris_deposit_kernel, num_k=num_k, block=block, stride=stride,
        width=width, pad=pad, bx=float(b[0]), by=float(b[1]), bz=float(b[2]),
        dt=dt, dt_dx=dt_dx, hi=float(ng - 1), swap=bool(swap_weights),
    )
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[_acc_spec(num_k, width)] + [_particle_spec(block)] * 8,
        out_specs=(_particle_spec(block),) * 4
        + (_acc_spec(num_k, wp + 1), _acc_spec(num_k, wp)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb, 1, block), p.dtype) for _ in range(4)
        ) + (
            jax.ShapeDtypeStruct((wp + 1, num_k), jnp.float32),
            jax.ShapeDtypeStruct((wp, num_k), jnp.float32),
        ),
        interpret=_interpret(),
    )(fwin_t, p_b, vx_b, vy_b, vz_b, c_b, a_b, wr_b, wn_b)
    n = p.shape[0]
    parts = tuple(o.reshape(-1)[:n] for o in outs[:4])
    acc_r, acc_n = outs[4], outs[5]
    rho = _fold_windows(acc_r[:-1].T.astype(wr.dtype), ng, False, stride,
                        row_offset=-pad)
    n_clamped = jnp.sum(acc_r[-1]).astype(jnp.int32)
    n_dens = _fold_windows(acc_n.T.astype(wn.dtype), ng, False, stride,
                           row_offset=-pad)
    return parts + (rho, n_dens, n_clamped)


# ---------------------------------------------------------------------------
# fused bounded sheath Picard iteration (PIC_L_DD.py:458-533): gather + CN
# push of active particles + wall-absorption check + current deposit with
# the wall surface-charge terms folded into the SAME deposit — a particle
# contributes either its current at the half-step position or its wall
# charge at the wall node (PIC_L_DD.py:41-68), so one tent pass covers both.
# ---------------------------------------------------------------------------


def _sheath_common(fwin_ref, ps, p0, u0, qm, act, scal_ref,
                   num_k, block, stride, width, cells):
    dt = scal_ref[0, 0]
    dt_dx = scal_ref[1, 0]
    is_act = act > 0.5  # ACTIVE == 1; LOST_RIGHT == 0, LOST_LEFT == -1
    e_p = _gather_at(
        fwin_ref, jnp.clip(ps, 0.0, cells), num_k, block, stride, width
    )
    accel = qm * e_p
    x1 = p0 + dt_dx * u0 + (0.5 * dt * dt_dx) * accel
    u1 = u0 + dt * accel
    x1 = jnp.where(is_act, x1, 0.0)
    u1 = jnp.where(is_act, u1, 0.0)
    xh = jnp.where(is_act, 0.5 * (p0 + x1), 0.0)
    uh = jnp.where(is_act, 0.5 * (u0 + u1), 0.0)
    # wall absorption on any of (x0, xh, x1) (PIC_L_DD.py:493-505)
    right = is_act & (
        (p0 >= cells) | (xh >= cells) | (x1 >= cells)
    )
    left = is_act & ((p0 <= 0.0) | (xh <= 0.0) | (x1 <= 0.0))
    act1 = jnp.where(right, 0.0, act)
    act1 = jnp.where(left, -1.0, act1)
    return x1, u1, xh, uh, act1


def _sheath_deposit_args(pos_active, val_active, act1, w, wall_ratio, cells):
    """Current deposit value/position with wall charge folded in
    (PIC_L_DD.py:50-63): active -> w*u at x; lost-left -> +w*ratio at node 0;
    lost-right -> -w*ratio at the last node."""
    is_act = act1 > 0.5
    lost_left = act1 < -0.5
    pos = jnp.where(is_act, pos_active, jnp.where(lost_left, 0.0, cells))
    val = jnp.where(
        is_act, w * val_active,
        jnp.where(lost_left, w * wall_ratio, -w * wall_ratio),
    )
    return pos, val


def _sheath_iter_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, u0_ref, qm_ref, w_ref, act_ref,
    xh_ref, act1_ref, jh_ref,
    *, num_k, block, stride, width, cells, wall_ratio,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        jh_ref[:] = jnp.zeros_like(jh_ref)

    x1, u1, xh, uh, act1 = _sheath_common(
        fwin_ref, ps_ref[0, 0, :], p0_ref[0, 0, :], u0_ref[0, 0, :],
        qm_ref[0, 0, :], act_ref[0, 0, :], scal_ref,
        num_k, block, stride, width, cells,
    )
    xh_ref[0, 0, :] = xh
    act1_ref[0, 0, :] = act1
    pos, val = _sheath_deposit_args(xh, uh, act1, w_ref[0, 0, :],
                                    wall_ratio, cells)
    _deposit_into(jh_ref, pos, val, num_k, block, stride, width)


def _sheath_final_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, u0_ref, qm_ref, w_ref, act_ref,
    x1_ref, u1_ref, act1_ref, j1_ref,
    *, num_k, block, stride, width, cells, wall_ratio,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        j1_ref[:] = jnp.zeros_like(j1_ref)

    x1, u1, xh, uh, act1 = _sheath_common(
        fwin_ref, ps_ref[0, 0, :], p0_ref[0, 0, :], u0_ref[0, 0, :],
        qm_ref[0, 0, :], act_ref[0, 0, :], scal_ref,
        num_k, block, stride, width, cells,
    )
    x1_ref[0, 0, :] = x1
    u1_ref[0, 0, :] = u1
    act1_ref[0, 0, :] = act1
    pos, val = _sheath_deposit_args(x1, u1, act1, w_ref[0, 0, :],
                                    wall_ratio, cells)
    _deposit_into(j1_ref, pos, val, num_k, block, stride, width)


def _sheath_call(kernel, n_out_particles, es, ps, p0, u0, qm, w, act,
                 *, dt, dx, wall_ratio, block, n_valid=None):
    ng = es.shape[0]
    cells = float(ng - 1)
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(es, num_k, False, stride, width)
    (ps_b, p0_b, u0_b, qm_b, w_b, act_b), nb, n, blocked = _as_blocks(
        [ps, p0, u0, qm, w, act], block, n_valid
    )
    scal = jnp.stack([
        jnp.asarray(dt, ps.dtype), jnp.asarray(dt / dx, ps.dtype),
        jnp.zeros((), ps.dtype), jnp.zeros((), ps.dtype),
    ]).reshape(4, 1)
    kern = functools.partial(
        kernel, num_k=num_k, block=block, stride=stride, width=width,
        cells=cells, wall_ratio=wall_ratio,
    )
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[_SMEM_SPEC, _acc_spec(num_k, width)]
        + [_particle_spec(block)] * 6,
        out_specs=(_particle_spec(block),) * n_out_particles
        + (_acc_spec(num_k, width),),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype)
            for _ in range(n_out_particles)
        ) + (jax.ShapeDtypeStruct((width, num_k), jnp.float32),),
        interpret=_interpret(),
    )(scal, fwin_t, ps_b, p0_b, u0_b, qm_b, w_b, act_b)
    parts = list(outs[:-1]) if blocked else [
        o.reshape(-1)[:n] for o in outs[:-1]
    ]
    grid_acc = _fold_windows(outs[-1].T.astype(ps.dtype), ng, False, stride)
    return parts, grid_acc


def sheath_picard_pallas(es, ps, p0, u0, qm, w, act, *, dt: float, dx: float,
                         wall_ratio: float, block: int = _DEFAULT_BLOCK,
                         n_valid: int | None = None):
    """Fused sheath Picard inner pass (one particle sweep).

    Args:
        es: (ng,) bounded half-step field guess.
        ps: (n,) position guess (previous xh).
        p0/u0: step-start positions (grid coords) / x-velocities.
        qm/w: per-particle q/m and deposit prefactor q p2c / dx (two
            species ride as arrays).
        act: (n,) float status: 1 active, 0 lost-right, -1 lost-left.
        wall_ratio: dx^2/dt — (wall charge dx q p2c/dt) / (w = q p2c/dx).
        n_valid: true count, required with pre-blocked inputs (pads are
            deposit-inert regardless via w == 0, see block_particles).

    Particle inputs may be (n,) or pre-blocked (nb, 1, block).
    Returns (xh, act1, jh) — jh includes the wall surface-charge terms but
    NOT the edge fold (j[0]+=j[1]...), which the caller applies.
    """
    (xh, act1), jh = _sheath_call(
        _sheath_iter_kernel, 2, es, ps, p0, u0, qm, w, act,
        dt=dt, dx=dx, wall_ratio=wall_ratio, block=block, n_valid=n_valid,
    )
    return xh, act1, jh


def sheath_finalize_pallas(es, ps, p0, u0, qm, w, act, *, dt: float,
                           dx: float, wall_ratio: float,
                           block: int = _DEFAULT_BLOCK,
                           n_valid: int | None = None):
    """Post-convergence sheath pass: (x1, u1, act1, j1). Accepts (n,) or
    pre-blocked particle inputs like sheath_picard_pallas."""
    (x1, u1, act1), j1 = _sheath_call(
        _sheath_final_kernel, 3, es, ps, p0, u0, qm, w, act,
        dt=dt, dx=dx, wall_ratio=wall_ratio, block=block, n_valid=n_valid,
    )
    return x1, u1, act1, j1


# ---------------------------------------------------------------------------
# gather
# ---------------------------------------------------------------------------


def _shared_gather(fwin_ref, pos, num_k, stride, block, width, frame_shift):
    """One window decomposition + selector, reusable by a subsequent
    deposit in the SAME kernel (the shared-window passes and the carried
    Boris deposit). ``frame_shift`` applies the frame-shifted geometry's
    +1 row offset (row l = node stride*k + l - 1) to the tent position
    before the gather. Returns (sel_t (K, B), d_s (B,) — shifted when
    frame_shift — and the gathered field e_p (B,))."""
    k, d_s = _window_decompose(pos, num_k, stride)
    if frame_shift:
        d_s = d_s + 1.0
    sel_t = _sel_t(k, num_k, pos.dtype)  # (K, B)
    tent_s = _tent_t(d_s, block, width)  # (width, B)
    frows_t = lax.dot_general(
        fwin_ref[:], sel_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(pos.dtype)  # (width, B)
    ones = jnp.ones((1, width), pos.dtype)
    e_p = lax.dot_general(
        ones, tent_s * frows_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(pos.dtype)[0]  # (B,)
    return sel_t, d_s, e_p


def _gather_at(fwin_ref, ps, num_k, block, stride, width):
    """Field value at each particle from the transposed window view."""
    _, _, e_p = _shared_gather(fwin_ref, ps, num_k, stride, block, width,
                               frame_shift=False)
    return e_p


def _gather_kernel(fwin_ref, p_ref, out_ref, *, num_k, block, stride, width):
    out_ref[0, 0, :] = _gather_at(fwin_ref, p_ref[0, 0, :], num_k, block,
                                  stride, width)


@functools.partial(jax.jit, static_argnames=("periodic", "block"))
def gather_pallas(field, p, *, periodic: bool, block: int = _DEFAULT_BLOCK):
    """CIC gather via the VMEM tent kernel. Same contract as ops.cic.gather."""
    ng = field.shape[0]
    n = p.shape[0]
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(field, num_k, periodic, stride, width)
    (p_b,), nb = _pad_blocks([p], block)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, num_k=num_k, block=block,
                          stride=stride, width=width),
        grid=(nb,),
        in_specs=[
            _acc_spec(num_k, width),
            _particle_spec(block),
        ],
        out_specs=_particle_spec(block),
        out_shape=jax.ShapeDtypeStruct((nb, 1, block), field.dtype),
        interpret=_interpret(),
    )(fwin_t, p_b)
    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# fused explicit leapfrog: gather + kick-drift-kick + periodic wrap in one
# sweep (pypic.py:722-731 / PIC_L.py:248-259) — skips the HBM round-trip of
# the gathered field and the second read of p.
# ---------------------------------------------------------------------------


def _leapfrog_body(scal_ref, fwin_ref, p_ref, v_ref,
                   num_k, ng, block, stride, width):
    """Shared gather + kick-drift-kick + periodic wrap of the explicit
    kernels (pypic.py:722-731): scal slots [0]=qm dt/2, [1]=dt/dx."""
    qm_dt_half = scal_ref[0, 0]
    dt_dx = scal_ref[1, 0]
    p = p_ref[0, 0, :]
    v = v_ref[0, 0, :]
    e_p = _gather_at(fwin_ref, p, num_k, block, stride, width)
    vh = v + qm_dt_half * e_p
    p1 = p + vh * dt_dx
    p1 = p1 - jnp.floor(p1 * (1.0 / ng)) * ng
    return p1, vh + qm_dt_half * e_p


def _leapfrog_kernel(
    scal_ref, fwin_ref, p_ref, v_ref, p1_ref, v1_ref,
    *, num_k, ng, block, stride, width,
):
    p1, v1 = _leapfrog_body(scal_ref, fwin_ref, p_ref, v_ref,
                            num_k, ng, block, stride, width)
    p1_ref[0, 0, :] = p1
    v1_ref[0, 0, :] = v1


def leapfrog_gather_push_pallas(
    field, p, v, *, qm, dt: float, dx: float, block: int = _DEFAULT_BLOCK,
):
    """Fused periodic CIC gather + leapfrog push + wrap: (p1, v1)."""
    ng = field.shape[0]
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(field, num_k, True, stride, width)
    (p_b, v_b), nb = _pad_blocks([p, v], block)
    scal = jnp.stack([
        0.5 * qm * dt, jnp.full_like(qm * dt, dt / dx),
        jnp.zeros_like(qm * dt), jnp.zeros_like(qm * dt),
    ]).reshape(4, 1).astype(p.dtype)
    kern = functools.partial(
        _leapfrog_kernel, num_k=num_k, ng=ng, block=block,
        stride=stride, width=width,
    )
    p1, v1 = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_k, width),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(_particle_spec(block), _particle_spec(block)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), p.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v.dtype),
        ),
        interpret=_interpret(),
    )(scal, fwin_t, p_b, v_b)
    n = p.shape[0]
    return p1.reshape(-1)[:n], v1.reshape(-1)[:n]


def _domain_cycle_kernel(
    scal_ref, fwin_ref, p_ref, v_ref, w_ref, p1_ref, v1_ref, acc_ref,
    *, num_kg, ng, stride_g, width_g, num_kd, ext_n, stride_d, width_d,
    block,
):
    """Explicit domain cycle as ONE particle sweep: periodic gather of the
    replicated GLOBAL field at p + leapfrog + carried deposit of p1 onto
    the halo-extended SLAB (the rho that opens the NEXT step's solve rides
    this step's push — the domain analog of _explicit_cycle_kernel's
    carried rho; the field solve itself stays outside, it needs the
    cross-shard halo fold + all_gather). Two window systems coexist: the
    gather decomposes wrapped global coordinates over (stride_g, width_g)
    windows of the (ng,) field; the deposit decomposes shifted slab-local
    coordinates p1 - lo + hw over (stride_d, width_d) windows of the
    (ext_n,) accumulator. Deposit rows pushed past the halo clamp at the
    ext edge and are counted into the accumulator's extra row (w > 0 rows
    only) — a silent charge misplacement is impossible.

    scal rows: [0] = qm dt/2, [1] = dt/dx, [2] = lo (slab origin in global
    grid coordinates, per-shard traced). Outputs p1 wrapped to [0, ng)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qm_dt_half = scal_ref[0, 0]
    dt_dx = scal_ref[1, 0]
    lo = scal_ref[2, 0]
    p = p_ref[0, 0, :]
    v = v_ref[0, 0, :]
    w = w_ref[0, 0, :]
    e_p = _gather_at(fwin_ref, p, num_kg, block, stride_g, width_g)
    vh = v + qm_dt_half * e_p
    p1 = p + vh * dt_dx  # raw global (can excurse off-slab by < halo)
    v1 = vh + qm_dt_half * e_p

    # lo arrives pre-shifted by the halo (lo' = lo - hw), so in-halo
    # particles land in [0, ext_n - 1] directly
    ploc = p1 - lo
    oob = ((ploc < 0.0) | (ploc > ext_n - 1.0)) & (w != 0.0)
    ploc = jnp.clip(ploc, 0.0, ext_n - 1.0)
    k, dd = _window_decompose(ploc, num_kd, stride_d)
    sel_t = _sel_t(k, num_kd, p.dtype)  # (K_d, B)
    tent = _tent_t(dd, block, width_d) * w[None, :]  # (width_d, B)
    contrib = lax.dot_general(
        tent, sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    clamp_row = lax.dot_general(
        oob.astype(p.dtype)[None, :], sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jnp.concatenate([contrib, clamp_row], axis=0).astype(
        acc_ref.dtype
    )
    p1_ref[0, 0, :] = p1 - jnp.floor(p1 * (1.0 / ng)) * ng
    v1_ref[0, 0, :] = v1


@functools.partial(
    jax.jit, static_argnames=("ext_n", "dt", "dx", "block")
)
def explicit_domain_cycle_pallas(
    field, p, v, w, *, qm, dt: float, dx: float, lo_shifted, ext_n: int,
    block: int = _DEFAULT_BLOCK,
):
    """Fused explicit domain cycle sweep: (p1_wrapped, v1, rho_ext,
    n_clamped).

    ``field`` is the replicated (ng,) global field; ``p`` wrapped global
    positions; ``w`` per-particle deposit weights (zero = dead slot);
    ``lo_shifted`` = slab origin minus halo (global grid coords, traced),
    so the deposit coordinate p1 - lo_shifted covers the (ext_n,) extended
    slab. Off-halo deposits clamp at the ext edge and are counted."""
    ng = field.shape[0]
    stride_g, width_g = _choose_window(ng)
    num_kg = _num_windows(ng, stride_g)
    stride_d, width_d = _choose_window(ext_n)
    num_kd = _num_windows(ext_n, stride_d)
    fwin_t = _window_field_t(field, num_kg, True, stride_g, width_g)
    (p_b, v_b, w_b), nb = _pad_blocks([p, v, w], block)
    scal = jnp.stack([
        0.5 * qm * dt, jnp.full_like(qm * dt, dt / dx),
        lo_shifted.astype(p.dtype), jnp.zeros_like(qm * dt),
    ]).reshape(4, 1).astype(p.dtype)
    kern = functools.partial(
        _domain_cycle_kernel, num_kg=num_kg, ng=ng, stride_g=stride_g,
        width_g=width_g, num_kd=num_kd, ext_n=ext_n, stride_d=stride_d,
        width_d=width_d, block=block,
    )
    p1, v1, acc = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_kg, width_g),
            _particle_spec(block),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(
            _particle_spec(block), _particle_spec(block),
            _acc_spec(num_kd, width_d + 1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), p.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v.dtype),
            jax.ShapeDtypeStruct((width_d + 1, num_kd), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, fwin_t, p_b, v_b, w_b)
    n = p.shape[0]
    rho_ext = _fold_windows(
        acc[:-1].T.astype(w.dtype), ext_n, False, stride_d
    )
    n_clamped = jnp.sum(acc[-1]).astype(jnp.int32)
    return (p1.reshape(-1)[:n], v1.reshape(-1)[:n], rho_ext, n_clamped)


def _fold_acc_rows(acc_ref, fold_ref, width):
    """(width, K) VMEM accumulator -> (1, ng) node row via one small
    (1, K) @ (K, ng) matmul per tent row (fold_ref: (width, K, ng); a
    flattening reshape is a sublane->lane relayout Mosaic refuses).
    HIGHEST precision: Mosaic's default f32-matmul lowering loses mantissa
    bits — here that shows up as ~1e-3-relative noise in the solved field
    feeding every subsequent step (and it broke a tol=1e-9 Picard residual
    outright when this pattern was trialed on the implicit loop, see
    PERF.md negative results)."""
    out = lax.dot_general(
        acc_ref[0:1, :], fold_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    for ell in range(1, width):
        out = out + lax.dot_general(
            acc_ref[ell:ell + 1, :], fold_ref[ell],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
    return out


def _explicit_cycle_kernel(
    scal_ref, fwin_ref, fold_ref, me_ref, p_ref, v_ref,
    p1_ref, v1_ref, rho_ref, e1_ref, acc_ref,
    *, num_k, ng, block, n_valid, nb, stride, width,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p1, v1 = _leapfrog_body(scal_ref, fwin_ref, p_ref, v_ref,
                            num_k, ng, block, stride, width)
    p1_ref[0, 0, :] = p1
    v1_ref[0, 0, :] = v1
    w = scal_ref[2, 0]
    vals = w * _lane_mask(i, block, n_valid, p1.dtype)
    _deposit_into(acc_ref, p1, vals, num_k, block, stride, width)

    # Epilogue on the last block: fold the window accumulator onto the ng
    # nodes and run the whole periodic field solve as precomputed
    # contractions — rho -> E is linear (neutralized circulant Poisson +
    # centered gradient), so the next step's field leaves the kernel with
    # the pushed particles: the full PIC cycle is ONE sweep. The fold runs
    # as one small (1, K) @ (K, ng) matmul per tent row (a flattening
    # reshape of the (width, K) accumulator is a sublane->lane relayout
    # Mosaic refuses to infer).
    @pl.when(i == nb - 1)
    def _():
        rho = _fold_acc_rows(acc_ref, fold_ref, width)  # (1, ng)
        rho_ref[:] = rho.astype(rho_ref.dtype)
        e1_ref[:] = lax.dot_general(
            rho, me_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        ).astype(e1_ref.dtype)


def explicit_cycle_pallas(
    e_field, p, v, ng: int, *, qm, w, dt: float, dx: float,
    fold_mat, me_mat, block: int = _DEFAULT_BLOCK,
):
    """The complete explicit PIC cycle as ONE kernel sweep: gather the
    carried field at p, leapfrog push + periodic wrap, deposit the new
    charge density, and solve for the next step's E in the last block's
    epilogue via precomputed contractions (``fold_mat``: (width, K, ng)
    per-tent-row window-fold matrices; ``me_mat``: (ng, ng) rho -> E
    neutralized-Poisson + gradient operator — build both with
    ``explicit_cycle_matrices``).

    Returns (p1, v1, rho1, e1).
    """
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(e_field, num_k, True, stride, width)
    (p_b, v_b), nb = _pad_blocks([p, v], block)
    n = p.shape[0]
    scal = jnp.stack([
        0.5 * qm * dt, jnp.full_like(qm * dt, dt / dx),
        w + jnp.zeros_like(qm * dt), jnp.zeros_like(qm * dt),
    ]).reshape(4, 1).astype(p.dtype)
    kern = functools.partial(
        _explicit_cycle_kernel, num_k=num_k, ng=ng, block=block,
        n_valid=n, nb=nb, stride=stride, width=width,
    )
    grid_spec = pl.BlockSpec((1, ng), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    p1, v1, rho, e1, _ = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_k, width),
            pl.BlockSpec((width, num_k, ng), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, ng), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(_particle_spec(block), _particle_spec(block),
                   grid_spec, grid_spec, _acc_spec(num_k, width)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), p.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v.dtype),
            jax.ShapeDtypeStruct((1, ng), p.dtype),
            jax.ShapeDtypeStruct((1, ng), p.dtype),
            jax.ShapeDtypeStruct((width, num_k), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, fwin_t, fold_mat, me_mat, p_b, v_b)
    return (p1.reshape(-1)[:n], v1.reshape(-1)[:n],
            rho.reshape(-1), e1.reshape(-1))


def explicit_cycle_matrices(ng: int, dx: float):
    """Precompute the one-kernel cycle's contraction matrices (f64 build,
    f32 cast): fold_mat maps the flattened (width, K) window accumulator
    onto the ng nodes (periodic overlap-add), me_mat maps rho to E through
    the neutralized periodic Poisson solve (ops.poisson) and the centered
    periodic gradient — both linear, so E = rho @ me_mat exactly matches
    the composed solve up to f32 rounding."""
    import numpy as np

    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fold = np.zeros((width, num_k, ng), np.float64)
    for ell in range(width):
        for k in range(num_k):
            fold[ell, k, (k * stride + ell) % ng] = 1.0
    # rho -> phi (neutralized circulant inverse) -> E (centered gradient),
    # built by pushing unit-rho columns through the runtime ops themselves
    # (vmap over the identity) so the operator matches the composed solve.
    # ensure_compile_time_eval: callers may build lazily inside a traced
    # step — the columns must become baked constants, not per-step ops.
    from .poisson import solve_periodic_neutralized
    from .fd import grad_periodic

    with jax.ensure_compile_time_eval():
        phi_cols = jax.vmap(
            lambda r: solve_periodic_neutralized(r, dx)
        )(jnp.eye(ng, dtype=jnp.float32))
        e_cols = jax.vmap(lambda ph: -grad_periodic(ph, dx))(phi_cols)
        me = jnp.asarray(e_cols)  # row j = E response to unit rho at node j
        return (jnp.asarray(fold, jnp.float32), me.astype(jnp.float32))


def _leapfrog_deposit_kernel(
    scal_ref, fwin_ref, p_ref, v_ref, p1_ref, v1_ref, rho_ref,
    *, num_k, ng, block, n_valid, stride, width,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        rho_ref[:] = jnp.zeros_like(rho_ref)

    p1, v1 = _leapfrog_body(scal_ref, fwin_ref, p_ref, v_ref,
                            num_k, ng, block, stride, width)
    p1_ref[0, 0, :] = p1
    v1_ref[0, 0, :] = v1
    w = scal_ref[2, 0]
    vals = w * _lane_mask(i, block, n_valid, p1.dtype)
    _deposit_into(rho_ref, p1, vals, num_k, block, stride, width)


def leapfrog_gather_push_deposit_pallas(
    field, p, v, *, qm, w, dt: float, dx: float,
    block: int = _DEFAULT_BLOCK,
):
    """One-sweep explicit cycle body: gather + leapfrog + wrap + charge
    deposit of the NEW positions — (p1, v1, rho1). The deposit that the
    next step's Poisson solve needs rides the push sweep, so the explicit
    engine touches each particle exactly once per step (``w`` is the
    scalar charge-density prefactor q p2c / dx)."""
    ng = field.shape[0]
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(field, num_k, True, stride, width)
    (p_b, v_b), nb = _pad_blocks([p, v], block)
    n = p.shape[0]
    scal = jnp.stack([
        0.5 * qm * dt, jnp.full_like(qm * dt, dt / dx),
        w + jnp.zeros_like(qm * dt), jnp.zeros_like(qm * dt),
    ]).reshape(4, 1).astype(p.dtype)
    kern = functools.partial(
        _leapfrog_deposit_kernel, num_k=num_k, ng=ng, block=block,
        n_valid=n, stride=stride, width=width,
    )
    p1, v1, acc = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_k, width),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(_particle_spec(block), _particle_spec(block),
                   _acc_spec(num_k, width)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), p.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v.dtype),
            jax.ShapeDtypeStruct((width, num_k), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, fwin_t, p_b, v_b)
    rho = _fold_windows(acc.T.astype(p.dtype), ng, True, stride)
    return p1.reshape(-1)[:n], v1.reshape(-1)[:n], rho


# ---------------------------------------------------------------------------
# resident multi-step explicit cycle: at small n the per-step cost is XLA
# dispatch (scan-step overhead, kernel launch, the window-view build and the
# metric reductions — ~25 us/step at 1e4 particles on v5e while the actual
# particle work is ~2 us). When the whole population fits VMEM, run S full
# PIC cycles inside ONE kernel invocation: particles, field, and the window
# view stay resident; the field solve and the window-view rebuild are the
# same precomputed contractions as the one-kernel cycle epilogue.
# ---------------------------------------------------------------------------


def _deposit_acc(pos, values, num_k, block, stride, width):
    """Value-form of _deposit_into: returns the (width, K) window
    accumulator contribution of one particle batch."""
    k, d = _window_decompose(pos, num_k, stride)
    m_t = _tent_t(d, block, width) * values[None, :]
    sel_t = _sel_t(k, num_k, pos.dtype)
    return lax.dot_general(
        m_t, sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _explicit_resident_kernel(
    scal_ref, e0_ref, fwin_ref, fold_ref, me_ref, sel_ref,
    p_ref, v_ref,
    p1_ref, v1_ref, rho_ref, e1_ref, fe_ref, ke_ref, jb_ref,
    *, num_k, ng, block, n_valid, stride, width, steps, spad, fe_c,
):
    qm_dt_half = scal_ref[0, 0]
    dt_dx = scal_ref[1, 0]
    w = scal_ref[2, 0]
    ke_c = scal_ref[3, 0]  # 0.5 * p2c * m
    jb_c = scal_ref[4, 0]  # q * p2c / (dx * ng)
    mask = (lax.broadcasted_iota(jnp.int32, (1, block), 1)
            < n_valid).astype(p_ref.dtype)[0]
    lane_s = lax.broadcasted_iota(jnp.int32, (1, spad), 1)
    zrow = jnp.zeros((1, spad), jnp.float32)

    def body(s, carry):
        p, v, e, fwin, rho, fe_row, ke_row, jb_row = carry
        # metrics of the CURRENT state (pre-push — engines.explicit order)
        at = lane_s == s
        fe_row = fe_row + jnp.where(at, fe_c * jnp.sum(e * e), zrow)
        ke_row = ke_row + jnp.where(
            at, ke_c * jnp.sum(v * v * mask), zrow)
        jb_row = jb_row + jnp.where(at, jb_c * jnp.sum(v * mask), zrow)

        e_p = _gather_at(fwin, p, num_k, block, stride, width)
        vh = v + qm_dt_half * e_p
        p1 = p + vh * dt_dx
        p1 = p1 - jnp.floor(p1 * (1.0 / ng)) * ng
        v1 = vh + qm_dt_half * e_p
        acc = _deposit_acc(p1, w * mask, num_k, block, stride, width)
        rho1 = _fold_acc_rows(acc, fold_ref, width)  # (1, ng)
        e1 = lax.dot_general(
            rho1, me_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        # window view of the new field: one (1, ng) @ (ng, K) selection dot
        # per tent row (exact — each output row sums one element)
        fwin1 = jnp.concatenate([
            lax.dot_general(
                e1, sel_ref[ell], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            for ell in range(width)
        ], axis=0)
        return p1, v1, e1, fwin1, rho1, fe_row, ke_row, jb_row

    p1, v1, e1, _, rho1, fe_row, ke_row, jb_row = lax.fori_loop(
        0, steps,
        body,
        (p_ref[0, 0, :], v_ref[0, 0, :], e0_ref[:], fwin_ref[:],
         jnp.zeros((1, ng), jnp.float32), zrow, zrow, zrow),
    )
    p1_ref[0, 0, :] = p1
    v1_ref[0, 0, :] = v1
    rho_ref[:] = rho1
    e1_ref[:] = e1
    fe_ref[:] = fe_row
    ke_ref[:] = ke_row
    jb_ref[:] = jb_row


def explicit_resident_matrices(ng: int, dx: float):
    """(fold, me, sel) for the resident multi-step cycle: the one-kernel
    cycle's matrices plus the window-view selection tensor sel[ell]:
    (ng, K) 0/1 columns with sel[ell, (stride k + ell) % ng, k] = 1 — the
    in-kernel rebuild of _window_field_t as exact dots."""
    import numpy as np

    fold, me = explicit_cycle_matrices(ng, dx)
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    sel = np.zeros((width, ng, num_k), np.float32)
    for ell in range(width):
        for k in range(num_k):
            sel[ell, (k * stride + ell) % ng, k] = 1.0
    return fold, me, jnp.asarray(sel)


_RESIDENT_MAX_N = 32768  # (8 + width + K) * B * 4 bytes must fit ~16MB VMEM


def explicit_cycle_resident_pallas(
    e_field, p, v, ng: int, steps: int, *, qm, w, ke_c, jb_c,
    dt: float, dx: float, fold_mat, me_mat, sel_mat, fe_c: float,
):
    """``steps`` full explicit PIC cycles in ONE kernel invocation —
    particles, field, and the window view stay VMEM-resident across steps
    (kills the ~25 us/step dispatch overhead that bounds the small-n rows).

    Same per-step math as explicit_cycle_pallas (gather + leapfrog + wrap
    + deposit + precomputed-contraction field solve); per-step metrics
    (field energy, kinetic energy, current bias — the PRE-push convention
    of engines.explicit) accumulate into (steps,) rows in-kernel.

    Args: qm/w traced scalars as in explicit_cycle_pallas; ke_c = 0.5 p2c
    m (traced), jb_c = q p2c / (dx ng) (traced), fe_c = 0.5 eps0 dx
    (static). Requires n <= 32768 (VMEM residency).

    Returns (p1, v1, rho1, e1, fe (steps,), ke (steps,), jb (steps,)).
    """
    n = p.shape[0]
    if n > _RESIDENT_MAX_N:
        raise ValueError(
            f"resident cycle requires n <= {_RESIDENT_MAX_N} (got {n})")
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(e_field, num_k, True, stride, width)
    block = -(-n // LANE) * LANE
    pad = block - n
    p_b = jnp.pad(p, (0, pad))[None, None, :]
    v_b = jnp.pad(v, (0, pad))[None, None, :]
    spad = -(-int(steps) // LANE) * LANE
    zero = jnp.zeros_like(qm * dt)
    scal = jnp.stack([
        0.5 * qm * dt, zero + dt / dx, w + zero, ke_c + zero, jb_c + zero,
        zero, zero, zero,
    ]).reshape(8, 1).astype(p.dtype)
    kern = functools.partial(
        _explicit_resident_kernel, num_k=num_k, ng=ng, block=block,
        n_valid=n, stride=stride, width=width, steps=int(steps), spad=spad,
        fe_c=float(fe_c),
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    p1, v1, rho, e1, fe, ke, jb = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((8, 1), memory_space=pltpu.SMEM),
            full, full, full, full, full, full, full,
        ],
        out_specs=(full,) * 7,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1, block), p.dtype),
            jax.ShapeDtypeStruct((1, 1, block), v.dtype),
            jax.ShapeDtypeStruct((1, ng), jnp.float32),
            jax.ShapeDtypeStruct((1, ng), jnp.float32),
            jax.ShapeDtypeStruct((1, spad), jnp.float32),
            jax.ShapeDtypeStruct((1, spad), jnp.float32),
            jax.ShapeDtypeStruct((1, spad), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, e_field[None, :].astype(jnp.float32),
      fwin_t, fold_mat, me_mat, sel_mat, p_b, v_b)
    s = int(steps)
    return (p1.reshape(-1)[:n], v1.reshape(-1)[:n], rho.reshape(-1),
            e1.reshape(-1), fe[0, :s], ke[0, :s], jb[0, :s])


def implicit_resident_matrices(ng: int, smooth: bool):
    """(fold, sels, sm) for the resident implicit step. fold: the
    (width, K, ng) window-fold rows; sels[ell]: (ng, K) with
    sels[ell, j, k] = S[(stride k + ell) % ng, j] so that
    fwin[ell] = smooth(es) @ window-view == es @ sels[ell] (the binomial
    smoother is linear and symmetric — it rides the baked selection);
    sm: (ng, ng) with smooth(j) == j @ sm. smooth=False bakes identity."""
    import numpy as np

    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fold = np.zeros((width, num_k, ng), np.float64)
    for ell in range(width):
        for k in range(num_k):
            fold[ell, k, (k * stride + ell) % ng] = 1.0
    s_mat = np.eye(ng)
    if smooth:
        s_mat = np.zeros((ng, ng))
        for g in range(ng):
            s_mat[g, (g - 1) % ng] = 0.25
            s_mat[g, g] = 0.5
            s_mat[g, (g + 1) % ng] = 0.25
    sels = np.zeros((width, ng, num_k), np.float64)
    for ell in range(width):
        for k in range(num_k):
            sels[ell, :, k] = s_mat[(k * stride + ell) % ng, :]
    return (jnp.asarray(fold, jnp.float32), jnp.asarray(sels, jnp.float32),
            jnp.asarray(s_mat.T, jnp.float32))


_RESIDENT_MAX_N_IMPLICIT = 131072


def _implicit_resident_kernel(
    scal_ref, e0_ref, ep_ref, j0_ref, fold_ref, sels_ref, sm_ref,
    p_ref, v_ref,
    p1_ref, v1_ref, e_ref, eprev_ref, j_ref,
    fe_ref, ke_ref, jb_ref, it_ref, res_ref, tx_ref, tv_ref,
    *, num_k, ng, block, chunk, n_valid, stride, width, steps, spad,
    dt_eps, tol, maxiter, extrapolate, anderson, fe_c, tracer,
):
    from .accel import anderson_mix

    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]
    w = scal_ref[3, 0]
    ke_c = scal_ref[4, 0]
    nch = block // chunk
    lane_s = lax.broadcasted_iota(jnp.int32, (1, spad), 1)
    zrow = jnp.zeros((1, spad), jnp.float32)
    gid = lax.broadcasted_iota(jnp.int32, (1, block), 1)[0]
    mask_all = (gid < n_valid).astype(jnp.float32)
    tr_mask = (gid == tracer).astype(jnp.float32)

    def fwin_of(es):
        """(1, ng) field -> smoothed transposed window view (width, K):
        exact/near-exact selection dots (HIGHEST — Mosaic's default f32
        matmul lowering loses mantissa, which broke a tol-1e-9 residual
        in the round-2c trial; see _fold_acc_rows)."""
        return jnp.concatenate([
            lax.dot_general(
                es, sels_ref[ell], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            for ell in range(width)
        ], axis=0)

    def step_body(s, carry):
        (p0, v0, e0, eprev, jh_c, fe_row, ke_row, jb_row, it_row, res_row,
         tx_row, tv_row) = carry
        es0 = e0 + 0.5 * (e0 - eprev) if extrapolate else e0

        def cond(c):
            return (c[4] > tol) & (c[5] < maxiter)

        def body(c):
            es, ps, _, _, _, k, g_prev, f_prev = c
            fwin = fwin_of(es)
            acc = jnp.zeros((width, num_k), jnp.float32)
            ph_parts = []
            for ci in range(nch):
                sl = slice(ci * chunk, (ci + 1) * chunk)
                e_p = _gather_at(fwin, ps[sl], num_k, chunk, stride, width)
                p1c = p0[sl] + dt_dx * v0[sl] + qm_dt2_half * e_p
                v1c = v0[sl] + qm_dt * e_p
                phc = 0.5 * (p0[sl] + p1c)
                phc = phc - jnp.floor(phc * (1.0 / ng)) * ng
                vhc = 0.5 * (v0[sl] + v1c)
                acc = acc + _deposit_acc(
                    phc, (w * vhc) * mask_all[sl], num_k, chunk, stride,
                    width)
                ph_parts.append(phc)
            ps1 = jnp.concatenate(ph_parts)
            jh = _fold_acc_rows(acc, fold_ref, width)  # (1, ng)
            sm_jh = lax.dot_general(
                jh, sm_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            e1 = e0 + dt_eps * (jnp.sum(jh) * (1.0 / ng) - sm_jh)
            eh = 0.5 * (e1 + e0)
            r = jnp.sum((es - eh) ** 2)
            if anderson:
                es_next, (g_prev, f_prev) = anderson_mix(
                    es, eh, k, (g_prev, f_prev))
            else:
                es_next = eh
            return es_next, ps1, e1, jh, r, k + 1, g_prev, f_prev

        z = jnp.zeros_like(e0)
        es, ps, e1, jh, r, k, _, _ = lax.while_loop(
            cond, body,
            (es0, p0, e0, jh_c, jnp.asarray(jnp.inf, jnp.float32),
             jnp.asarray(0, jnp.int32), z, z),
        )

        # finalize='converged': deposit-free sweep from the converged field
        fwin = fwin_of(es)
        p1_parts, v1_parts = [], []
        for ci in range(nch):
            sl = slice(ci * chunk, (ci + 1) * chunk)
            e_p = _gather_at(fwin, ps[sl], num_k, chunk, stride, width)
            p1c = p0[sl] + dt_dx * v0[sl] + qm_dt2_half * e_p
            p1c = p1c - jnp.floor(p1c * (1.0 / ng)) * ng
            v1_parts.append(v0[sl] + qm_dt * e_p)
            p1_parts.append(p1c)
        p1 = jnp.concatenate(p1_parts)
        v1 = jnp.concatenate(v1_parts)

        at = lane_s == s
        fe_row = fe_row + jnp.where(at, fe_c * jnp.sum(e1 * e1), zrow)
        ke_row = ke_row + jnp.where(
            at, ke_c * jnp.sum(v1 * v1 * mask_all), zrow)
        jb_row = jb_row + jnp.where(
            at, (w / ng) * jnp.sum(v1 * mask_all), zrow)
        it_row = it_row + jnp.where(at, k.astype(jnp.float32), zrow)
        res_row = res_row + jnp.where(at, r, zrow)
        tx_row = tx_row + jnp.where(at, jnp.sum(p1 * tr_mask), zrow)
        tv_row = tv_row + jnp.where(at, jnp.sum(v1 * tr_mask), zrow)
        return (p1, v1, e1, e0, jh, fe_row, ke_row, jb_row, it_row,
                res_row, tx_row, tv_row)

    (p1, v1, e1, eprev, jh, fe_row, ke_row, jb_row, it_row, res_row,
     tx_row, tv_row) = lax.fori_loop(
        0, steps, step_body,
        (p_ref[0, 0, :], v_ref[0, 0, :], e0_ref[:], ep_ref[:], j0_ref[:],
         zrow, zrow, zrow, zrow, zrow, zrow, zrow),
    )
    p1_ref[0, 0, :] = p1
    v1_ref[0, 0, :] = v1
    e_ref[:] = e1
    eprev_ref[:] = eprev
    j_ref[:] = jh
    fe_ref[:] = fe_row
    ke_ref[:] = ke_row
    jb_ref[:] = jb_row
    it_ref[:] = it_row
    res_ref[:] = res_row
    tx_ref[:] = tx_row
    tv_ref[:] = tv_row


def implicit_resident_pallas(
    e0, e_prev, j0, p, v, ng: int, steps: int, *, qm, w, ke_c,
    dt: float, dx: float, tol: float, maxiter: int, extrapolate: bool,
    anderson: bool, fe_c: float, tracer: int, fold_mat, sels_mat, sm_mat,
    chunk: int = 8192,
):
    """``steps`` full implicit CN-Picard steps in ONE kernel invocation
    (the engines.implicit fused path with finalize='converged',
    finalize_field='last', separate windows): particles and fields stay
    VMEM-resident; the Picard loop is an in-kernel while_loop; the
    smoothing, window-view and fold operators are baked HIGHEST-precision
    contractions (implicit_resident_matrices). Particle sweeps run in
    ``chunk``-lane slices so the tent/selector intermediates fit VMEM at
    any resident n.

    Per-step metrics (field/kinetic energy, current bias, Picard
    iterations + residual, tracer trajectory) accumulate into (steps,)
    rows. Returns (p1, v1, e1, e_prev_out, jh, metrics dict of rows).
    """
    n = p.shape[0]
    if n > _RESIDENT_MAX_N_IMPLICIT:
        raise ValueError(
            f"resident implicit requires n <= {_RESIDENT_MAX_N_IMPLICIT}")
    stride, width = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    block = -(-n // chunk) * chunk if n > chunk else -(-n // LANE) * LANE
    ch = min(chunk, block)
    pad = block - n
    p_b = jnp.pad(p, (0, pad))[None, None, :]
    v_b = jnp.pad(v, (0, pad))[None, None, :]
    spad = -(-int(steps) // LANE) * LANE
    zero = jnp.zeros_like(qm * dt)
    scal = jnp.stack([
        qm * dt, 0.5 * qm * dt * (dt / dx), zero + dt / dx, w + zero,
        ke_c + zero, zero, zero, zero,
    ]).reshape(8, 1).astype(p.dtype)
    kern = functools.partial(
        _implicit_resident_kernel, num_k=num_k, ng=ng, block=block,
        chunk=ch, n_valid=n, stride=stride, width=width, steps=int(steps),
        spad=spad, dt_eps=float(dt) / _EPSILON_0, tol=float(tol),
        maxiter=int(maxiter), extrapolate=bool(extrapolate),
        anderson=bool(anderson), fe_c=float(fe_c), tracer=int(tracer),
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    row = jax.ShapeDtypeStruct((1, spad), jnp.float32)
    grid_row = jax.ShapeDtypeStruct((1, ng), jnp.float32)
    outs = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((8, 1), memory_space=pltpu.SMEM)]
        + [full] * 8,
        out_specs=(full,) * 12,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1, block), p.dtype),
            jax.ShapeDtypeStruct((1, 1, block), v.dtype),
            grid_row, grid_row, grid_row,
            row, row, row, row, row, row, row,
        ),
        interpret=_interpret(),
    )(scal, e0[None, :].astype(jnp.float32),
      e_prev[None, :].astype(jnp.float32), j0[None, :].astype(jnp.float32),
      fold_mat, sels_mat, sm_mat, p_b, v_b)
    (p1, v1, e1, eprev, jh, fe, ke, jb, it, res, tx, tv) = outs
    s = int(steps)
    rows = dict(
        fe=fe[0, :s], ke=ke[0, :s], jb=jb[0, :s],
        iters=it[0, :s].astype(jnp.int32), resid=res[0, :s],
        tracer_x=tx[0, :s], tracer_v=tv[0, :s],
    )
    return (p1.reshape(-1)[:n], v1.reshape(-1)[:n], e1.reshape(-1),
            eprev.reshape(-1), jh.reshape(-1), rows)


def _deposit_into(out_ref, pos, values, num_k, block, stride, width):
    k, d = _window_decompose(pos, num_k, stride)
    m_t = _tent_t(d, block, width) * values[None, :]
    sel_t = _sel_t(k, num_k, pos.dtype)  # (K, B): NT contraction, no relayout
    out_ref[:] += lax.dot_general(
        m_t, sel_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _picard_iter_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, ph_ref, *rest,
    num_k, ng, block, n_valid, stride, width, emit_v,
):
    if emit_v:
        v1_ref, jh_ref = rest
    else:
        (jh_ref,) = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        jh_ref[:] = jnp.zeros_like(jh_ref)

    # Runtime scalars via SMEM: [qm dt, qm dt dt/dx / 2, dt/dx, w].
    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]
    w = scal_ref[3, 0]

    ps = ps_ref[0, 0, :]  # position guess xs (pypic.py:253, 293)
    p0 = p0_ref[0, 0, :]
    v0 = v0_ref[0, 0, :]

    # Gather the (pre-smoothed, window-folded) field at xs (pypic.py:261).
    e_p = _gather_at(fwin_ref, ps, num_k, block, stride, width)

    # Crank-Nicolson half step (pypic.py:264-272), grid coordinates.
    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    ph = 0.5 * (p0 + p1)
    ph = ph - jnp.floor(ph * (1.0 / ng)) * ng
    vh = 0.5 * (v0 + v1)
    ph_ref[0, 0, :] = ph
    if emit_v:
        # Full-step velocity of THIS iterate: with finalize='iterate' the
        # engine reconstructs (p1, v1) of the last Picard iterate from it
        # (pypic.py:293-295 returns the last iterate) — no extra sweep.
        v1_ref[0, 0, :] = v1

    vals = (w * vh) * _lane_mask(i, block, n_valid, ph.dtype)
    _deposit_into(jh_ref, ph, vals, num_k, block, stride, width)


def _picard_iter_sw_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, ph_ref, *rest,
    num_k, ng, block, n_valid, stride, width, emit_v,
):
    """Shared-window Picard pass: ONE window decomposition + selector
    serves both the gather (at ps) and the deposit (at ph).

    The selector build is the second-largest VPU cost of the separate-
    window pass (~0.065 ms per column-build pair per 1e8 particles).
    Frame-shifted geometry (_choose_window_sw): stride = width - 4 and
    the window's row l maps to node stride*k + l - 1, so the gather span
    [1, stride + 2) keeps a one-row margin on each side. The midpoint
    iterate ph never strays more than an acceleration displacement from
    ps once the engine seeds ps with the free-streaming midpoint, so the
    deposit's tent — built at d_s plus the nearest-image delta — lands
    in the SAME width rows whenever |delta| <= 1 cell (the round-3
    pad=2 variant widened the deposit tent to 12 rows, Mosaic-tiled to
    16, and measured 27% slower than separate on v5e). The nearest-image
    delta keeps periodic wraps exact; out-of-window excursions
    (pathological fields only) are clamped to the frame edge and COUNTED
    into the accumulator's extra row — the engine surfaces the count as
    a metric so a silent charge misplacement is impossible.
    """
    if emit_v:
        v1_ref, jh_ref = rest
    else:
        (jh_ref,) = rest
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

    # one decomposition + one selector for the whole pass; the frame
    # shift puts a one-row margin on each side of the gather span
    sel_t, d_s, e_p = _shared_gather(fwin_ref, ps, num_k, stride, block,
                                     width, frame_shift=True)

    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    ph_raw = 0.5 * (p0 + p1)
    vh = 0.5 * (v0 + v1)
    if emit_v:
        v1_ref[0, 0, :] = v1

    # deposit at ph in ps's window: nearest-image offset handles the
    # periodic seam exactly (ps is wrapped, ph_raw is not)
    delta = ph_raw - ps
    delta = delta - jnp.round(delta * (1.0 / ng)) * ng
    d_h = d_s + delta
    mask = _lane_mask(i, block, n_valid, ps.dtype)
    oob = ((d_h < 0.0) | (d_h > width - 1.0)).astype(ps.dtype) * mask
    d_h = jnp.clip(d_h, 0.0, width - 1.0)
    vals = (w * vh) * mask
    m_t = _tent_t(d_h, block, width) * vals[None, :]  # (width, B)
    contrib = lax.dot_general(
        m_t, sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    clamp_row = lax.dot_general(
        oob[None, :], sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    jh_ref[:] += jnp.concatenate([contrib, clamp_row], axis=0).astype(
        jh_ref.dtype
    )

    ph_ref[0, 0, :] = ph_raw - jnp.floor(ph_raw * (1.0 / ng)) * ng


def _picard_final_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, p1_ref, v1_ref, j1_ref,
    *, num_k, ng, block, n_valid, stride, width,
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

    e_p = _gather_at(fwin_ref, ps, num_k, block, stride, width)
    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    p1 = p1 - jnp.floor(p1 * (1.0 / ng)) * ng  # pypic.py:277
    p1_ref[0, 0, :] = p1
    v1_ref[0, 0, :] = v1

    vals = (w * v1) * _lane_mask(i, block, n_valid, p1.dtype)
    _deposit_into(j1_ref, p1, vals, num_k, block, stride, width)


def _picard_final_nodep_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, p1_ref, v1_ref,
    *, num_k, ng, block, stride, width,
):
    """Finalize sweep without the full-step current deposit: the deposit is
    purely diagnostic (the Ampere advance consumed only jh, pypic.py:283),
    and its exact grid mean is recoverable as w sum(v1)/ng — so the default
    finalize='converged' skips the tent build entirely (~30% of the sweep)."""
    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]

    ps = ps_ref[0, 0, :]
    p0 = p0_ref[0, 0, :]
    v0 = v0_ref[0, 0, :]

    e_p = _gather_at(fwin_ref, ps, num_k, block, stride, width)
    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    p1 = p1 - jnp.floor(p1 * (1.0 / ng)) * ng  # pypic.py:277
    p1_ref[0, 0, :] = p1
    v1_ref[0, 0, :] = v1


def _scalars(qm, dt, dx, w, dtype):
    return jnp.stack(
        [qm * dt, 0.5 * qm * dt * (dt / dx),
         jnp.full_like(qm * dt, dt / dx), w]
    ).reshape(4, 1).astype(dtype)


_SMEM_SPEC = pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)


# ---------------------------------------------------------------------------
# fused implicit Picard iteration on an extended (halo) slab — the
# domain-decomposed engine's local pass (pypic_tpu.parallel.domain_implicit):
# positions are local slab coordinates already shifted by the halo width, the
# grid is bounded (no wrap — the ring halo exchange outside provides
# periodicity), the deposit weight rides per particle (alive mask folded in),
# and positions are clamped to the halo range for grid operations only (the
# raw iterate is carried so excursion counting stays exact).
# ---------------------------------------------------------------------------


def _picard_iter_ext_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, w_ref, ph_ref, *rest,
    num_k, block, stride, width, lo, hi, emit_v,
):
    if emit_v:
        v1_ref, jh_ref = rest
    else:
        (jh_ref,) = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        jh_ref[:] = jnp.zeros_like(jh_ref)

    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]

    ps = jnp.clip(ps_ref[0, 0, :], lo, hi)
    p0 = p0_ref[0, 0, :]
    v0 = v0_ref[0, 0, :]
    w = w_ref[0, 0, :]

    e_p = _gather_at(fwin_ref, ps, num_k, block, stride, width)
    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    ph = 0.5 * (p0 + p1)
    vh = 0.5 * (v0 + v1)
    ph_ref[0, 0, :] = ph  # raw iterate (excursions counted by the caller)
    if emit_v:
        v1_ref[0, 0, :] = v1  # see _picard_iter_kernel: finalize='iterate'
    _deposit_into(jh_ref, jnp.clip(ph, lo, hi), w * vh,
                  num_k, block, stride, width)


def _picard_iter_ext_sw_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, w_ref, ph_ref, *rest,
    num_k, block, stride, width, lo, hi, emit_v,
):
    """Shared-window variant of the extended-slab Picard pass (see
    _picard_iter_sw_kernel, incl. the frame-shifted stride = width - 4
    geometry): one decomposition + selector for gather AND deposit. The
    slab is bounded, so no periodic nearest-image is needed — both
    positions are clamped to [lo, hi] exactly as the separate-window
    pass clamps them, and the deposit offset is their difference.
    Edge-clamped deposits land in the accumulator's extra row."""
    if emit_v:
        v1_ref, jh_ref = rest
    else:
        (jh_ref,) = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        jh_ref[:] = jnp.zeros_like(jh_ref)

    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]

    psc = jnp.clip(ps_ref[0, 0, :], lo, hi)
    p0 = p0_ref[0, 0, :]
    v0 = v0_ref[0, 0, :]
    w = w_ref[0, 0, :]

    sel_t, d_s, e_p = _shared_gather(fwin_ref, psc, num_k, stride, block,
                                     width, frame_shift=True)

    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    ph = 0.5 * (p0 + p1)
    vh = 0.5 * (v0 + v1)
    ph_ref[0, 0, :] = ph  # raw iterate (excursions counted by the caller)
    if emit_v:
        v1_ref[0, 0, :] = v1

    delta = jnp.clip(ph, lo, hi) - psc
    d_h = d_s + delta
    alive = (w != 0.0).astype(psc.dtype)
    oob = ((d_h < 0.0) | (d_h > width - 1.0)).astype(psc.dtype) * alive
    d_h = jnp.clip(d_h, 0.0, width - 1.0)
    m_t = _tent_t(d_h, block, width) * (w * vh)[None, :]
    contrib = lax.dot_general(
        m_t, sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    clamp_row = lax.dot_general(
        oob[None, :], sel_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    jh_ref[:] += jnp.concatenate([contrib, clamp_row], axis=0).astype(
        jh_ref.dtype
    )


def _finalize_epilogue(p1, v1, w, st_ref, p1_ref, scal_ref, i,
                       *, lo, hi, ng):
    """Shared wrap + statistics epilogue of the ext finalize kernels.

    Emits the GLOBAL wrapped position (scal slot 3 carries lo - hw, the
    per-shard shift) and accumulates three step statistics into a tiny
    (8, 128) accumulator, each spread over lane (program_id mod 128) so
    per-lane partials see only ceil(nb/128) sequential additions instead
    of nb (rounding error grows with the sequential chain length; the
    engine tree-reduces the 128 lanes): row 0 = sum w*v1 partials,
    row 1 = sum_{alive} v1^2 partials, row 2 = halo-clamp counts (block
    counts <= block stay integer-exact in f32; the engine sums row 2 in
    int32 so the total is exact past 2^24). Saves the engine's separate
    full-array reduction passes (~5 ms/step at 1e8 on v5e).

    ``ng == 0`` (static) skips the global wrap: positions come back raw in
    the kernel's shifted-local coordinates (plus ``lo_shift``, normally 0
    then) — the migration-amortized superstep's micro-steps carry local
    positions across steps and only wrap + migrate on the last one."""
    lo_shift = scal_ref[3, 0]

    @pl.when(i == 0)
    def _():
        st_ref[:] = jnp.zeros_like(st_ref)

    alive = w != 0.0
    # explicit casts: weak float literals promote to f64 under x64 (tests)
    s_wv = jnp.sum(w * v1).astype(st_ref.dtype)
    s_vv = jnp.sum(jnp.where(alive, v1 * v1, 0.0)).astype(st_ref.dtype)
    s_cl = jnp.sum(
        (alive & ((p1 < lo) | (p1 > hi))).astype(st_ref.dtype))
    pg = p1 + lo_shift
    if ng > 0:
        pg = pg - jnp.floor(pg * (1.0 / ng)) * ng
    p1_ref[0, 0, :] = pg
    rr = lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
    cc = lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    z = jnp.zeros((8, LANE), st_ref.dtype)
    lane = cc == i % LANE
    contrib = jnp.where((rr == 0) & lane, s_wv, z)
    contrib = contrib + jnp.where((rr == 1) & lane, s_vv, z)
    contrib = contrib + jnp.where((rr == 2) & lane, s_cl, z)
    st_ref[:] += contrib


def _picard_final_ext_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, w_ref, p1_ref, v1_ref, j1_ref,
    *rest, num_k, block, stride, width, lo, hi, ng,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        j1_ref[:] = jnp.zeros_like(j1_ref)

    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]

    ps = jnp.clip(ps_ref[0, 0, :], lo, hi)
    p0 = p0_ref[0, 0, :]
    v0 = v0_ref[0, 0, :]
    w = w_ref[0, 0, :]

    e_p = _gather_at(fwin_ref, ps, num_k, block, stride, width)
    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    v1_ref[0, 0, :] = v1
    _deposit_into(j1_ref, jnp.clip(p1, lo, hi), w * v1,
                  num_k, block, stride, width)
    if rest:  # stats mode: wrap to global + accumulate step statistics
        _finalize_epilogue(p1, v1, w, rest[0], p1_ref, scal_ref, i,
                           lo=lo, hi=hi, ng=ng)
    else:
        p1_ref[0, 0, :] = p1  # raw (caller wraps to global + migrates)


def _picard_final_ext_nodep_kernel(
    scal_ref, fwin_ref, ps_ref, p0_ref, v0_ref, *rest,
    num_k, block, stride, width, lo, hi, ng,
):
    """Extended-slab finalize without the j1 deposit (see
    _picard_final_nodep_kernel — same rationale, domain form)."""
    i = pl.program_id(0)
    qm_dt = scal_ref[0, 0]
    qm_dt2_half = scal_ref[1, 0]
    dt_dx = scal_ref[2, 0]

    ps = jnp.clip(ps_ref[0, 0, :], lo, hi)
    p0 = p0_ref[0, 0, :]
    v0 = v0_ref[0, 0, :]

    e_p = _gather_at(fwin_ref, ps, num_k, block, stride, width)
    p1 = p0 + dt_dx * v0 + qm_dt2_half * e_p
    v1 = v0 + qm_dt * e_p
    if len(rest) == 4:  # stats mode: (w_ref, p1_ref, v1_ref, st_ref)
        w_ref, p1_ref, v1_ref, st_ref = rest
        v1_ref[0, 0, :] = v1
        _finalize_epilogue(p1, v1, w_ref[0, 0, :], st_ref, p1_ref,
                           scal_ref, i, lo=lo, hi=hi, ng=ng)
    else:
        p1_ref, v1_ref = rest
        p1_ref[0, 0, :] = p1  # raw: caller wraps
        v1_ref[0, 0, :] = v1


def picard_finalize_ext_nodep_pallas(
    field_ext, ps, p0, v0, ext_n: int,
    *, qm, dt: float, dx: float, lo: float, hi: float,
    block: int = _DEFAULT_BLOCK, n_valid: int | None = None,
    w=None, lo_shift=None, ng: int = 0,
):
    """Post-convergence extended-slab pass without the j1 deposit:
    (p1_raw, v1). Accepts (n,) or pre-blocked particle inputs.

    With ``w``/``lo_shift`` given (stats mode), the kernel also wraps
    positions to GLOBAL grid coordinates in-kernel (``ng > 0``) and returns
    (p1_global, v1, stats) where stats is an (8, 128) accumulator of
    per-lane partials — row 0 = sum w*v1, row 1 = sum_alive v1^2,
    row 2 = halo-clamp counts (reduce each row over lanes) — saving the
    engine's separate wrap + reduction passes. ``ng == 0`` keeps positions
    raw in shifted-local coordinates (superstep micro-steps; pass
    ``lo_shift=0.0``) while still accumulating the statistics."""
    stats = lo_shift is not None
    if stats and (w is None or ng < 0):
        raise ValueError("stats mode requires w AND lo_shift together")
    if w is not None and not stats:
        raise ValueError("w given without lo_shift — stats mode needs both "
                         "(w alone would be silently ignored; ng > 0 "
                         "additionally wraps positions globally, ng == 0 "
                         "keeps them raw)")
    stride, wdth = _choose_window(ext_n)
    num_k = _num_windows(ext_n, stride)
    fwin_t = _window_field_t(field_ext, num_k, False, stride, wdth)
    arrs = [ps, p0, v0] + ([w] if stats else [])
    blocks, nb, n, blocked = _as_blocks(arrs, block, n_valid)
    scal = _ext_scalars(qm, dt, dx, ps.dtype, lo_shift)
    kern = functools.partial(
        _picard_final_ext_nodep_kernel, num_k=num_k, block=block,
        stride=stride, width=wdth, lo=lo, hi=hi, ng=ng,
    )
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[_SMEM_SPEC, _acc_spec(num_k, wdth)]
        + [_particle_spec(block)] * len(blocks),
        out_specs=(_particle_spec(block), _particle_spec(block))
        + ((pl.BlockSpec((8, LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),) if stats else ()),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v0.dtype),
        ) + ((jax.ShapeDtypeStruct((8, LANE), jnp.float32),)
             if stats else ()),
        interpret=_interpret(),
    )(scal, fwin_t, *blocks)
    p1, v1 = outs[0], outs[1]
    if not blocked:
        p1, v1 = p1.reshape(-1)[:n], v1.reshape(-1)[:n]
    if stats:
        return p1, v1, outs[2]
    return p1, v1


def _ext_scalars(qm, dt, dx, dtype, lo_shift=None):
    """SMEM scalar vector; slot 3 carries the per-shard global shift
    (lo - hw) in stats mode, zero otherwise."""
    s3 = jnp.zeros_like(qm * dt) if lo_shift is None else (
        jnp.asarray(lo_shift) + jnp.zeros_like(qm * dt))
    return jnp.stack(
        [qm * dt, 0.5 * qm * dt * (dt / dx),
         jnp.full_like(qm * dt, dt / dx), s3]
    ).reshape(4, 1).astype(dtype)


def picard_iteration_ext_pallas(
    field_ext, ps, p0, v0, w, ext_n: int,
    *, qm, dt: float, dx: float, lo: float, hi: float,
    block: int = _DEFAULT_BLOCK, emit_v: bool = False,
    n_valid: int | None = None, share_window: bool = False,
):
    """Fused Picard inner pass on a bounded extended slab.

    Args:
        field_ext: (ext_n,) smoothed halo-extended field.
        ps/p0/v0: local positions (shifted by the halo width) and velocities.
        w: per-particle deposit prefactor, zero for dead slots.
        lo/hi: position clamp for grid operations (halo excursion bound).
        emit_v: also return the iterate's full-step velocity (for the
            no-extra-sweep finalize='iterate').
        n_valid: true particle count — required when the particle arrays
            come pre-blocked from ``block_particles`` (blocked inputs give
            blocked particle outputs and skip per-pass pad/slice copies).

    Returns (ph_raw, jh_ext), or (ph_raw, v1, jh_ext) with ``emit_v``;
    with ``share_window=True`` (see picard_iteration_pallas) the return
    gains a trailing ``n_clamped`` count of deposits clamped at the
    shared-window frame edge (|iterate displacement| > 1 cell).
    """
    if share_window:
        stride, wdth = _choose_window_sw(ext_n)
    else:
        stride, wdth = _choose_window(ext_n)
    num_k = _num_windows(ext_n, stride)
    fwin_t = _window_field_t(field_ext, num_k, False, stride, wdth,
                             off=1 if share_window else 0)
    (ps_b, p0_b, v0_b, w_b), nb, n, blocked = _as_blocks(
        [ps, p0, v0, w], block, n_valid)
    scal = _ext_scalars(qm, dt, dx, ps.dtype)
    if share_window:
        acc_rows = wdth + 1
        kern = functools.partial(
            _picard_iter_ext_sw_kernel, num_k=num_k, block=block,
            stride=stride, width=wdth, lo=lo, hi=hi, emit_v=emit_v,
        )
    else:
        acc_rows = wdth
        kern = functools.partial(
            _picard_iter_ext_kernel, num_k=num_k, block=block,
            stride=stride, width=wdth, lo=lo, hi=hi, emit_v=emit_v,
        )
    n_pout = 2 if emit_v else 1
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_k, wdth),
            _particle_spec(block),
            _particle_spec(block),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(_particle_spec(block),) * n_pout
        + (_acc_spec(num_k, acc_rows),),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype)
            for _ in range(n_pout)
        ) + (jax.ShapeDtypeStruct((acc_rows, num_k), jnp.float32),),
        interpret=_interpret(),
    )(scal, fwin_t, ps_b, p0_b, v0_b, w_b)
    parts = tuple(outs[:-1] if blocked
                  else (o.reshape(-1)[:n] for o in outs[:-1]))
    acc = outs[-1]
    if share_window:
        jh = _fold_windows(acc[:-1].T.astype(ps.dtype), ext_n, False, stride,
                           row_offset=-1)
        n_clamped = jnp.sum(acc[-1]).astype(jnp.int32)
        return parts + (jh, n_clamped)
    return parts + (
        _fold_windows(acc.T.astype(ps.dtype), ext_n, False, stride),
    )


def picard_finalize_ext_pallas(
    field_ext, ps, p0, v0, w, ext_n: int,
    *, qm, dt: float, dx: float, lo: float, hi: float,
    block: int = _DEFAULT_BLOCK, n_valid: int | None = None,
    lo_shift=None, ng: int = 0,
):
    """Post-convergence pass on the extended slab: (p1_raw, v1, j1_ext).
    Accepts (n,) or pre-blocked particle inputs. With ``lo_shift``
    (stats mode) positions come back GLOBAL-wrapped (``ng > 0``) or raw
    shifted-local (``ng == 0``, superstep micro-steps) and a stats
    accumulator is appended — see picard_finalize_ext_nodep_pallas."""
    stats = lo_shift is not None
    if stats and ng < 0:
        raise ValueError("stats mode requires ng >= 0 with lo_shift")
    stride, wdth = _choose_window(ext_n)
    num_k = _num_windows(ext_n, stride)
    fwin_t = _window_field_t(field_ext, num_k, False, stride, wdth)
    (ps_b, p0_b, v0_b, w_b), nb, n, blocked = _as_blocks(
        [ps, p0, v0, w], block, n_valid)
    scal = _ext_scalars(qm, dt, dx, ps.dtype, lo_shift)
    kern = functools.partial(
        _picard_final_ext_kernel, num_k=num_k, block=block,
        stride=stride, width=wdth, lo=lo, hi=hi, ng=ng,
    )
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_k, wdth),
            _particle_spec(block),
            _particle_spec(block),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(
            _particle_spec(block),
            _particle_spec(block),
            _acc_spec(num_k, wdth),
        ) + ((pl.BlockSpec((8, LANE), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),) if stats else ()),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v0.dtype),
            jax.ShapeDtypeStruct((wdth, num_k), jnp.float32),
        ) + ((jax.ShapeDtypeStruct((8, LANE), jnp.float32),)
             if stats else ()),
        interpret=_interpret(),
    )(scal, fwin_t, ps_b, p0_b, v0_b, w_b)
    p1, v1, j1 = outs[0], outs[1], outs[2]
    jg = _fold_windows(j1.T.astype(ps.dtype), ext_n, False, stride)
    if not blocked:
        p1, v1 = p1.reshape(-1)[:n], v1.reshape(-1)[:n]
    if stats:
        return p1, v1, jg, outs[3]
    return p1, v1, jg


def picard_iteration_pallas(
    field_smoothed, ps, p0, v0, ng: int,
    *, qm, w, dt: float, dx: float, block: int = _DEFAULT_BLOCK,
    emit_v: bool = False, n_valid: int | None = None,
    share_window: bool = False,
):
    """Fused Picard inner pass. Returns (ph, jh) — the new half-step
    positions (the next iteration's gather guess) and the (ng,) half-step
    current — or (ph, v1, jh) with ``emit_v`` (the iterate's full-step
    velocity, for the no-extra-sweep finalize).

    ``share_window=True`` reuses the gather's window decomposition +
    selector for the deposit (_picard_iter_sw_kernel, frame-shifted
    geometry): the return gains a trailing ``n_clamped`` scalar counting
    deposits clamped at the window-frame edge (0 in any sane
    configuration — seed ps with the free-streaming midpoint so the
    deposit offset is an acceleration displacement under 1 cell).

    Particle inputs may be (n,) or pre-blocked (nb, 1, block) from
    ``block_particles`` (then ``n_valid`` is required); blocked inputs
    yield blocked particle outputs with no pad/slice copies per pass."""
    if share_window:
        stride, wdth = _choose_window_sw(ng)
    else:
        stride, wdth = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(field_smoothed, num_k, True, stride, wdth,
                             off=1 if share_window else 0)
    (ps_b, p0_b, v0_b), nb, n, blocked = _as_blocks([ps, p0, v0], block,
                                                    n_valid)
    scal = _scalars(qm, dt, dx, w, ps.dtype)
    if share_window:
        acc_rows = wdth + 1  # + the clamp-count row
        kern = functools.partial(
            _picard_iter_sw_kernel, num_k=num_k, ng=ng, block=block,
            n_valid=n, stride=stride, width=wdth, emit_v=emit_v,
        )
    else:
        acc_rows = wdth
        kern = functools.partial(
            _picard_iter_kernel, num_k=num_k, ng=ng, block=block,
            n_valid=n, stride=stride, width=wdth, emit_v=emit_v,
        )
    n_pout = 2 if emit_v else 1
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_k, wdth),
            _particle_spec(block),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(_particle_spec(block),) * n_pout
        + (_acc_spec(num_k, acc_rows),),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype)
            for _ in range(n_pout)
        ) + (jax.ShapeDtypeStruct((acc_rows, num_k), jnp.float32),),
        interpret=_interpret(),
    )(scal, fwin_t, ps_b, p0_b, v0_b)
    parts = tuple(outs[:-1] if blocked
                  else (o.reshape(-1)[:n] for o in outs[:-1]))
    acc = outs[-1]
    if share_window:
        jh = _fold_windows(acc[:-1].T.astype(ps.dtype), ng, True, stride,
                           row_offset=-1)
        n_clamped = jnp.sum(acc[-1]).astype(jnp.int32)
        return parts + (jh, n_clamped)
    return parts + (_fold_windows(acc.T.astype(ps.dtype), ng, True, stride),)


def picard_finalize_nodep_pallas(
    field_smoothed, ps, p0, v0, ng: int,
    *, qm, dt: float, dx: float, block: int = _DEFAULT_BLOCK,
    n_valid: int | None = None,
):
    """Post-convergence pass without the j1 deposit: final (p1, v1) only
    (see _picard_final_nodep_kernel). Accepts (n,) or pre-blocked particle
    inputs like picard_iteration_pallas."""
    stride, wdth = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(field_smoothed, num_k, True, stride, wdth)
    (ps_b, p0_b, v0_b), nb, n, blocked = _as_blocks([ps, p0, v0], block,
                                                    n_valid)
    scal = _scalars(qm, dt, dx, jnp.zeros_like(qm), ps.dtype)
    kern = functools.partial(
        _picard_final_nodep_kernel, num_k=num_k, ng=ng, block=block,
        stride=stride, width=wdth,
    )
    p1, v1 = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_k, wdth),
            _particle_spec(block),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(_particle_spec(block), _particle_spec(block)),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v0.dtype),
        ),
        interpret=_interpret(),
    )(scal, fwin_t, ps_b, p0_b, v0_b)
    if blocked:
        return p1, v1
    return p1.reshape(-1)[:n], v1.reshape(-1)[:n]


def picard_finalize_pallas(
    field_smoothed, ps, p0, v0, ng: int,
    *, qm, w, dt: float, dx: float, block: int = _DEFAULT_BLOCK,
    n_valid: int | None = None,
):
    """Post-convergence pass: final (p1, v1) and full-step current j1.
    Accepts (n,) or pre-blocked particle inputs like
    picard_iteration_pallas."""
    stride, wdth = _choose_window(ng)
    num_k = _num_windows(ng, stride)
    fwin_t = _window_field_t(field_smoothed, num_k, True, stride, wdth)
    (ps_b, p0_b, v0_b), nb, n, blocked = _as_blocks([ps, p0, v0], block,
                                                    n_valid)
    scal = _scalars(qm, dt, dx, w, ps.dtype)
    kern = functools.partial(
        _picard_final_kernel, num_k=num_k, ng=ng, block=block,
        n_valid=n, stride=stride, width=wdth,
    )
    p1, v1, j1 = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _SMEM_SPEC,
            _acc_spec(num_k, wdth),
            _particle_spec(block),
            _particle_spec(block),
            _particle_spec(block),
        ],
        out_specs=(
            _particle_spec(block),
            _particle_spec(block),
            _acc_spec(num_k, wdth),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, 1, block), ps.dtype),
            jax.ShapeDtypeStruct((nb, 1, block), v0.dtype),
            jax.ShapeDtypeStruct((wdth, num_k), jnp.float32),
        ),
        interpret=_interpret(),
    )(scal, fwin_t, ps_b, p0_b, v0_b)
    jg = _fold_windows(j1.T.astype(ps.dtype), ng, True, stride)
    if blocked:
        return p1, v1, jg
    return p1.reshape(-1)[:n], v1.reshape(-1)[:n], jg
