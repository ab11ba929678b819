"""Pallas TPU kernels for per-particle random draws (hardware PRNG).

Why this exists: fixed-shape re-injection / re-activation resamples a
full-capacity batch every step and masks in the slots that need it
(SURVEY.md §7 hard part 2). The draw itself then dominates the small-n
engine steps: at 1e6 particles the sheath step's threefry+erfinv chain over
(n, 3) velocities is 0.26 ms of a 0.57 ms device step (profiled on v5e —
``multiply_select_fusion`` at engines/sheath.py re-injection), and the
counter-based murmur3 sampler (``sources.hash_uniforms``) is *worse* on
TPU because the VPU has no native 32-bit integer multiply — the per-lane
mixer lowers to long emulation sequences (measured +0.25 ms/step
in-engine vs threefry; scratch/bench_sheath_intercept.py).

The TPU-native answer is the per-core hardware PRNG
(``pltpu.prng_seed`` / ``pltpu.prng_random_bits``): seeding is one scalar
op per *block* (not per particle), random bits are architecturally cheap,
and the uniform->Maxwellian transform (bit-trick uniform + Box-Muller)
fuses with the masked state update in one VMEM sweep — no (n, 3)
intermediate ever touches HBM.

Determinism: draws are a pure function of (seed, block index), with the
seed derived from the step's PRNG key (``sources.seed_from_key``), so runs
are reproducible on TPU. They are NOT bit-identical to the 'threefry' or
'hash' samplers (identical distributions; equivalence is statistical —
tested) and NOT reproducible across backends: off-TPU (interpret mode,
CPU tests) the kernels consume threefry bits generated outside the kernel
because interpret mode has no ``prng_seed`` lowering.

Reference behavior covered: PIC_L_DD.py:420-450 (Langevin thermostat +
wall re-injection of the sheath driver ``main_i``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_cic import _DEFAULT_BLOCK, _as_blocks, _interpret

__all__ = ["sheath_reinject_pallas", "source_batch_pallas"]


def _u01(bits):
    """uint32 bits -> f32 uniforms in [2^-23, 1): set the low mantissa bit,
    splice in the [1, 2) exponent, subtract 1 — three cheap lane ops, no
    int->float convert (u32 converts are emulated on the VPU)."""
    mant = (bits >> 9) | jnp.uint32(1)
    return jax.lax.bitcast_convert_type(
        mant | jnp.uint32(0x3F800000), jnp.float32
    ) - 1.0


_TWO_PI = 6.283185307179586


def _maxwell3(u4):
    """(4, B) uniforms -> three standard normals via Box-Muller (two from
    the first pair, one from the second pair's cosine branch)."""
    r0 = jnp.sqrt(-2.0 * jnp.log(u4[0]))
    t0 = jnp.float32(_TWO_PI) * u4[1]
    r1 = jnp.sqrt(-2.0 * jnp.log(u4[2]))
    t1 = jnp.float32(_TWO_PI) * u4[3]
    return r0 * jnp.cos(t0), r0 * jnp.sin(t0), r1 * jnp.cos(t1)


def _ndraw(gamma):
    return 10 if gamma > 0.0 else 5


def _reinject_kernel(
    seed_ref, p_ref, u_ref, vy_ref, vz_ref, act_ref, sig_ref, sigth_ref,
    bits_ref, p1_ref, u1_ref, vy1_ref, vz1_ref,
    *, cells, gamma, block, hw_prng,
):
    """One sweep: thermostat resample (prob gamma, active slots) + wall
    re-injection (uniform position + species-Maxwellian velocity, lost
    slots). The two masks are disjoint (PIC_L_DD.py:420-450), so order is
    immaterial. Pad rows carry act == 0 -> 'lost' -> they get drawn over,
    but the caller's n_valid masking drops them (blocked outputs keep pad
    rows inert downstream because the Picard kernels re-mask on act)."""
    ndraw = _ndraw(gamma)
    if hw_prng:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits((ndraw, block)), jnp.uint32
        )
    else:
        bits = bits_ref[0]
    u = _u01(bits)

    # draw layout: u[0:4] re-injection Box-Muller pairs, u[4] position;
    # with a thermostat: u[5] acceptance uniform, u[6:10] its BM pairs
    act = act_ref[0, 0, :]
    sig = sig_ref[0, 0, :]
    z0, z1, z2 = _maxwell3(u[0:4])
    x_new = u[4] * jnp.float32(cells)

    lost = act != 1.0
    p1 = jnp.where(lost, x_new, p_ref[0, 0, :])
    u1 = jnp.where(lost, z0 * sig, u_ref[0, 0, :])
    vy1 = jnp.where(lost, z1 * sig, vy_ref[0, 0, :])
    vz1 = jnp.where(lost, z2 * sig, vz_ref[0, 0, :])

    if gamma > 0.0:
        sig_t = sigth_ref[0, 0, :]
        hit = (act == 1.0) & (u[5] < gamma)
        w0, w1, w2 = _maxwell3(u[6:10])
        u1 = jnp.where(hit, w0 * sig_t, u1)
        vy1 = jnp.where(hit, w1 * sig_t, vy1)
        vz1 = jnp.where(hit, w2 * sig_t, vz1)

    p1_ref[0, 0, :] = p1
    u1_ref[0, 0, :] = u1
    vy1_ref[0, 0, :] = vy1
    vz1_ref[0, 0, :] = vz1


def _source_batch_kernel(seed_ref, bits_ref, x_ref, vx_ref, vy_ref, vz_ref,
                         *, x_mu, x_sigma, x_wrap, vth, vx, block, hw_prng):
    """Volumetric-source batch draw (pygcpic.py:723-755 distribution):
    x ~ N(x_mu, x_sigma) wrapped mod x_wrap, each velocity component
    ~ N(vx, vth). Runs with ZERO per-particle inputs — unlike the sheath
    re-injection sweep there is no operand-materialization tax at the
    pallas boundary, so the hardware PRNG wins outright here."""
    if hw_prng:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits((4, block)), jnp.uint32
        )
    else:
        bits = bits_ref[0]
    u = _u01(bits)
    r0 = jnp.sqrt(-2.0 * jnp.log(u[0]))
    t0 = jnp.float32(_TWO_PI) * u[1]
    r1 = jnp.sqrt(-2.0 * jnp.log(u[2]))
    t1 = jnp.float32(_TWO_PI) * u[3]
    z0 = r0 * jnp.cos(t0)
    z1 = r0 * jnp.sin(t0)
    z2 = r1 * jnp.cos(t1)
    z3 = r1 * jnp.sin(t1)
    x = z0 * jnp.float32(x_sigma) + jnp.float32(x_mu)
    x = x - jnp.floor(x * jnp.float32(1.0 / x_wrap)) * jnp.float32(x_wrap)
    x_ref[0, 0, :] = x
    vx_ref[0, 0, :] = z1 * jnp.float32(vth) + jnp.float32(vx)
    vy_ref[0, 0, :] = z2 * jnp.float32(vth) + jnp.float32(vx)
    vz_ref[0, 0, :] = z3 * jnp.float32(vth) + jnp.float32(vx)


@functools.partial(
    jax.jit,
    static_argnames=("n", "x_mu", "x_sigma", "x_wrap", "vth", "vx", "block"),
)
def source_batch_pallas(seed, key, n: int, *, x_mu, x_sigma, x_wrap, vth,
                        vx=0.0, block: int = _DEFAULT_BLOCK):
    """Full-capacity volumetric Maxwellian source batch on the TPU
    hardware PRNG. Returns flat (x, vx, vy, vz) arrays of length n (x in
    the units of x_mu/x_sigma/x_wrap). ``key`` feeds the off-TPU interpret
    fallback's threefry bits (same transform, different draws)."""
    nb = (n + block - 1) // block
    interpret = _interpret()
    if interpret:
        bits = jax.random.bits(key, (nb, 4, block), jnp.uint32)
    else:
        bits = jnp.zeros((1, 4, 8), jnp.uint32)
    pspec = pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bits_spec = (
        pl.BlockSpec((1, 4, block), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        if interpret
        else pl.BlockSpec((1, 4, 8), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    )
    outs = pl.pallas_call(
        functools.partial(
            _source_batch_kernel, x_mu=float(x_mu), x_sigma=float(x_sigma),
            x_wrap=float(x_wrap), vth=float(vth), vx=float(vx), block=block,
            hw_prng=not interpret,
        ),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bits_spec],
        out_specs=(pspec, pspec, pspec, pspec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb, 1, block), jnp.float32)
            for _ in range(4)
        ),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.uint32).reshape(1), bits)
    return tuple(o.reshape(-1)[:n] for o in outs)


@functools.partial(
    jax.jit,
    static_argnames=("cells", "gamma", "n_valid", "block"),
)
def sheath_reinject_pallas(
    seed, key, p, u, vy, vz, act, sig, sigth=None, *, cells, gamma=0.0,
    n_valid=None, block: int = _DEFAULT_BLOCK,
):
    """Fused thermostat + re-injection sweep (PIC_L_DD.py:420-450).

    seed: uint32 scalar (hardware-PRNG path, TPU); key: jax PRNG key used
    only by the off-TPU interpret fallback to synthesize the bit streams.
    act: (n,) float {1, 0, -1} status; sig / sigth: per-particle Maxwellian
    sigmas sqrt(kBT/m) for re-injection / thermostat. Accepts flat (n,) or
    pre-blocked (nb, 1, block) particle arrays (n_valid required when
    blocked); returns (p', u', vy', vz') in the input layout.
    """
    gamma = float(gamma)
    if sigth is None:
        sigth = sig
    arrs = [p, u, vy, vz, act, sig, sigth]
    (p_b, u_b, vy_b, vz_b, act_b, sig_b, sigth_b), nb, n_valid, was_blocked = \
        _as_blocks(arrs, block, n_valid)

    interpret = _interpret()
    ndraw = _ndraw(gamma)
    if interpret:
        bits = jax.random.bits(key, (nb, ndraw, block), jnp.uint32)
    else:
        bits = jnp.zeros((1, ndraw, 8), jnp.uint32)  # unused placeholder

    pspec = pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bits_spec = (
        pl.BlockSpec((1, ndraw, block), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        if interpret
        else pl.BlockSpec((1, ndraw, 8), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    )
    outs = pl.pallas_call(
        functools.partial(
            _reinject_kernel, cells=float(cells), gamma=gamma, block=block,
            hw_prng=not interpret,
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pspec, pspec, pspec, pspec, pspec, pspec, pspec,
            bits_spec,
        ],
        out_specs=(pspec, pspec, pspec, pspec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb, 1, block), p_b.dtype) for _ in range(4)
        ),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.uint32).reshape(1), p_b, u_b, vy_b, vz_b,
      act_b, sig_b, sigth_b, bits)
    if was_blocked:
        return outs
    return tuple(o.reshape(-1)[:n_valid] for o in outs)
