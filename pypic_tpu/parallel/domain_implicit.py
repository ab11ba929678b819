"""Domain-decomposed implicit CN-Picard engine (slab-sharded fields).

Composes the flagship energy-conserving engine (pypic.py:216-300, rebuilt in
``pypic_tpu.engines.implicit``) with the slab machinery of
``pypic_tpu.parallel.domain`` — and goes one step further than the explicit
carrier: **the grid never exists globally**. The Ampere-law field advance
``E1 = E0 + (dt/eps0)(<jh> - smooth(jh))`` (pypic.py:283) is local up to a
scalar psum (the mean) and a radius-1 binomial stencil (a 1-node halo), so E
and j stay slab-sharded through the whole Picard loop:

* per iteration, each shard gathers the smoothed field guess from a
  halo-extended slab (width ``halo + 2`` nodes, covering the worst-case
  intra-step particle excursion), runs the Crank-Nicolson update in local
  slab coordinates, and deposits the half-/full-step currents onto the
  extended slab, folding halo contributions back to their owners with
  ``ppermute`` — per-device grid work is O(ng/D + halo), never O(ng);
* the Picard residual ``||Es - Eh||^2`` (pypic.py:289) and the current mean
  are psum-reduced scalars, so the ``lax.while_loop`` trip count is
  replicated across shards by construction;
* particles whose half-step excursion exceeds ``halo`` cells are clamped to
  the halo edge for grid operations and **counted** (``n_halo_clamped``) —
  detected, never silent; size ``halo`` against dt * v_max / dx;
* after convergence the final positions wrap and multi-hop migrate to their
  owner slabs (``domain.migrate``).

This is the BASELINE.json configs[4] workload ("domain-decomposed run at
1e8 particles ... with halo exchange").
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import EPSILON_0
from ..grid import GridSpec
from ..ops import deposit, gather, grad_periodic, solve_periodic_neutralized
from .domain import (
    distribute_by_slab,
    halo_extend,
    halo_fold,
    migrate,
    ring_perms,
    state_spec,  # noqa: F401  (1D helper, kept importable)
)

shard_map = jax.shard_map


@dataclasses.dataclass(frozen=True)
class DomainImplicitConfig:
    grid: GridSpec  # periodic; ng must divide by num_shards
    dt: float
    p2c: float
    num_shards: int
    tol: float = 1e-3  # on ||Es - Eh||^2 (pypic.py:859)
    maxiter: int = 20  # pypic.py:860
    halo: int = 4  # max intra-step particle excursion, cells
    migrate_cap: int = 4096
    smooth: bool = True  # pypic.py:261,283 (False = gen-1 PIC_L.py variant)
    # 'field' = reference start es0 = E0 (pypic.py:253); 'extrapolate' =
    # linear prediction E0 + (E0 - E_prev)/2 — same fixed point/tolerance,
    # ~1 fewer Picard iteration; 'extrapolate2' = quadratic prediction
    # (15 E0 - 10 E_prev + 3 E_prev2)/8 (see engines.implicit.ImplicitConfig).
    picard_init: str = "field"
    # 'converged' (default) recomputes (p1, v1) from the *converged*
    # half-step field with one extra fused sweep, skipping the purely-
    # diagnostic j1 deposit (state.j = half-step current); 'converged-
    # deposit' also deposits the true j1; 'iterate' returns the last Picard
    # iterate like the reference (pypic.py:293-295) with no extra sweep but
    # its last-iterate drift bias (see engines.implicit.ImplicitConfig
    # .finalize and PERF.md's drift table). Fused backend only.
    finalize: str = "converged"
    # Field the finalize sweep gathers with (fused backend, finalize !=
    # 'iterate'): 'last' | 'mean2' | 'map' | 'aitken' — see
    # engines.implicit.ImplicitConfig.finalize_field. The aitken Δ²
    # contraction estimate psums its two inner products over the slab
    # axis, so the slab-sharded extrapolation equals the global one.
    # Accuracy/diagnostics option: fixed-3 + 'aitken' measured 2.60e9 on
    # v5e but FAILS the 1e4-step drift criterion at 1e8 (PERF.md
    # round-3j), so the headline stays maxiter=4 + 'last'.
    finalize_field: str = "last"
    # 'fused' runs each local Picard pass as one Pallas sweep over the shard's
    # particles (gather from the halo-extended slab + CN + extended-slab
    # deposit — the domain form of engines.implicit's fused backend);
    # 'composed' assembles it from individual ops; 'auto' = fused on TPU.
    backend: str = "auto"
    # Picard iterate mixing (see engines.implicit.ImplicitConfig.picard_accel
    # and ops.accel): same fixed point and residual test; the secant inner
    # products are psum'd over the slab axis so mixing on the slab-sharded
    # field equals mixing on the global one. 'anderson' + maxiter=4 +
    # tol=1e-30 + picard_init='extrapolate' is the conserving configuration
    # (PERF.md round-3 drift table).
    picard_accel: str = "none"
    # Shared-window fused Picard pass (see
    # engines.implicit.ImplicitConfig.window_share): one window
    # decomposition + selector for gather AND deposit on the extended
    # slab, with a free-streaming-midpoint iterate seed and the
    # picard_clamped metric counting widened-edge clamps. 'auto'
    # currently = separate (pending TPU A/B + drift re-verification).
    window_share: str = "auto"
    axis_name: str = "slabs"
    deposit_method: str = "auto"
    # Data-parallel axis composed WITH the slab axis on a 2D device mesh
    # (slabs x replicas): each slab's particles split over num_replicas
    # devices, fields slab-sharded and replicated across replicas, slab
    # deposits psum'd over the replica axis, migration rides the slab axis
    # within each replica independently (no replica-axis traffic). This is
    # how the engine scales past one device per slab — mesh via
    # make_mesh2(num_shards, num_replicas).
    dp_axis_name: str | None = None
    num_replicas: int = 1

    def __post_init__(self):
        for f in ("dt", "p2c", "tol"):
            object.__setattr__(self, f, float(getattr(self, f)))
        for f in ("maxiter", "halo", "migrate_cap", "num_shards",
                  "num_replicas"):
            object.__setattr__(self, f, int(getattr(self, f)))
        if self.grid.ng % self.num_shards:
            raise ValueError(
                f"ng={self.grid.ng} not divisible by {self.num_shards} shards"
            )
        if (self.num_replicas > 1) != (self.dp_axis_name is not None):
            raise ValueError(
                "num_replicas > 1 requires dp_axis_name (and vice versa)"
            )
        if self.halo + 3 > self.cells_per_shard:
            raise ValueError(
                f"halo={self.halo} too large for {self.cells_per_shard}-cell "
                "slabs (need halo + 3 <= cells_per_shard)"
            )
        if self.picard_init not in ("field", "extrapolate", "extrapolate2"):
            raise ValueError(f"unknown picard_init {self.picard_init!r}")
        if self.finalize not in ("converged", "converged-deposit", "iterate"):
            raise ValueError(f"unknown finalize {self.finalize!r}")
        if self.finalize_field not in ("last", "mean2", "map", "aitken"):
            raise ValueError(f"unknown finalize_field {self.finalize_field!r}")
        if self.finalize == "iterate" and self.finalize_field != "last":
            raise ValueError(
                "finalize='iterate' has no finalize sweep to redirect — "
                f"finalize_field={self.finalize_field!r} would be silently "
                "ignored; use finalize='converged' (or finalize_field='last')"
            )
        if self.window_share not in ("auto", "shared", "separate"):
            raise ValueError(f"unknown window_share {self.window_share!r}")
        if self.picard_accel not in ("none", "anderson", "anderson2",
                                     "damped"):
            raise ValueError(f"unknown picard_accel {self.picard_accel!r}")

    @property
    def cells_per_shard(self) -> int:
        return self.grid.ng // self.num_shards


class DomainImplicitState(struct.PyTreeNode):
    p: jax.Array  # (S*capacity,) global grid coords, sharded
    v: jax.Array  # (S*capacity,) [m/s], sharded
    alive: jax.Array  # (S*capacity,) bool, sharded
    q: jax.Array  # () [C]
    m: jax.Array  # () [kg]
    e: jax.Array  # (ng,) [V/m], slab-sharded
    j: jax.Array  # (ng,) [A/m^2], slab-sharded
    e_prev: jax.Array  # (ng,) previous-step field (picard_init='extrapolate')
    e_prev2: jax.Array  # (ng,) field two steps back (picard_init='extrapolate2')
    step: jax.Array  # () int32


class StepMetrics(NamedTuple):
    field_energy: jax.Array
    kinetic_energy: jax.Array
    current_bias: jax.Array
    picard_iters: jax.Array
    picard_residual: jax.Array
    n_alive: jax.Array
    n_migrated: jax.Array
    n_dropped: jax.Array
    n_halo_clamped: jax.Array  # final-iterate excursions beyond the halo
    # deposits clamped at the shared-window edge (window_share='shared'
    # fused path only; see engines.implicit.ImplicitConfig.window_share)
    picard_clamped: jax.Array = 0


def init_state(
    x, v, q, m, cfg: DomainImplicitConfig, capacity_factor: float = 1.5,
) -> DomainImplicitState:
    """Slab-distribute particles; initial Poisson solve for E0 and deposit of
    j0 on the full grid (pypic.py:549-554), then slab-split — init is host
    side and O(ng) once."""
    grid = cfg.grid
    ng = grid.ng
    dx = grid.dx
    p_glob = (jnp.asarray(x) / dx).astype(jnp.float32)
    v_glob = jnp.asarray(v, jnp.float32)
    w = float(q) * (cfg.p2c / dx)
    rho0 = deposit(p_glob, jnp.full_like(p_glob, w), ng, periodic=True,
                   method="scatter")
    j0 = deposit(p_glob, w * v_glob, ng, periodic=True, method="scatter")
    phi0 = solve_periodic_neutralized(rho0, dx)
    phi0 = phi0 - jnp.max(phi0)
    e0 = -grad_periodic(phi0, dx)

    (p_out, v_out), alive, _ = distribute_by_slab(
        [np.asarray(p_glob), np.asarray(v_glob)], x, cfg, capacity_factor
    )
    if cfg.num_replicas > 1:
        # Split each slab's population round-robin over the replica axis:
        # layout (S, R, cap_r) so sharding P((slabs, dp)) puts replica r of
        # slab s on device (s, r). Lane-align the per-replica capacity.
        r_tot = cfg.num_replicas
        cap_r = -(-p_out.shape[1] // r_tot)
        cap_r = -(-cap_r // 128) * 128

        def split(a, fill):
            out = np.full((a.shape[0], r_tot, cap_r), fill, a.dtype)
            for r in range(r_tot):
                cols = a[:, r::r_tot]
                out[:, r, : cols.shape[1]] = cols
            return out

        p_out = split(p_out, 0.0)
        v_out = split(v_out, 0.0)
        alive = split(alive, False)
    return DomainImplicitState(
        p=jnp.asarray(p_out.reshape(-1)),
        v=jnp.asarray(v_out.reshape(-1)),
        alive=jnp.asarray(alive.reshape(-1)),
        q=jnp.asarray(q, jnp.float32),
        m=jnp.asarray(m, jnp.float32),
        e=e0.astype(jnp.float32),
        j=j0.astype(jnp.float32),
        e_prev=e0.astype(jnp.float32),
        e_prev2=e0.astype(jnp.float32),
        step=jnp.asarray(0, jnp.int32),
    )


def _state_specs(cfg) -> DomainImplicitState:
    """PartitionSpecs: particles over (slabs[, dp]), fields over slabs
    (replicated across dp), scalars replicated."""
    ax = cfg.axis_name
    pp = P((ax, cfg.dp_axis_name)) if cfg.dp_axis_name else P(ax)
    return DomainImplicitState(
        p=pp, v=pp, alive=pp, q=P(), m=P(), e=P(ax), j=P(ax),
        e_prev=P(ax), e_prev2=P(ax), step=P(),
    )


def shard_state(state, mesh: Mesh, cfg) -> DomainImplicitState:
    return jax.tree.map(
        lambda leaf, s: jax.device_put(
            leaf, jax.sharding.NamedSharding(mesh, s)
        ),
        state, _state_specs(cfg),
    )


def make_step(cfg: DomainImplicitConfig, mesh: Mesh):
    """Per-step-migration stepper: step(state) -> (state, scalar metrics)."""
    return _make_stepper(cfg, mesh, None)


def make_superstep(cfg: DomainImplicitConfig, mesh: Mesh, migrate_every: int):
    """Migration-amortized superstep: run ``migrate_every`` CN-Picard
    micro-steps back-to-back and wrap + migrate particles ONCE, on the last.

    The extended-slab gathers/deposits already handle any excursion within
    ``cfg.halo`` cells of the owning slab (halo contributions ride
    ``ppermute`` back to their owners), so per-step migration is
    bookkeeping, not physics — it only keeps excursions bounded. Measured
    motivation: ~2.6 ms/step of migrate routing at 1e8 on v5e with nothing
    to route (PERF.md domain items); amortizing it over k steps also keeps
    the particle arrays in the kernels' blocked layout across micro-steps.

    Size ``halo >= migrate_every * v_max * dt / dx``: particles that
    outrun the halo mid-superstep are clamped for grid work and counted in
    ``n_halo_clamped`` (per micro-step) — detected, never silent.

    Contract: superstep(state) -> (state, metrics) where every StepMetrics
    leaf gains a leading (migrate_every,) axis — one entry per micro-step.
    ``n_migrated``/``n_dropped`` are nonzero only in the last slot and
    ``n_alive`` reflects post-migration survivors there; ``state.step``
    advances by ``migrate_every``. Trajectories equal the per-step-migrate
    stepper's up to f32 reduction-order (deposit fold grouping differs for
    off-slab particles).
    """
    migrate_every = int(migrate_every)
    if migrate_every < 1:
        raise ValueError(f"migrate_every must be >= 1, got {migrate_every}")
    return _make_stepper(cfg, mesh, migrate_every)


def _make_stepper(cfg: DomainImplicitConfig, mesh: Mesh, k_mig):
    """Shared builder: ``k_mig=None`` -> the per-step path (scalar metrics,
    in-kernel global wrap — the round-2c flagship, numerically untouched);
    ``k_mig=k`` -> the k-micro-step superstep (stacked metrics)."""
    grid = cfg.grid
    ng = grid.ng
    dx = grid.dx
    dt = cfg.dt
    dt_dx = dt / dx
    c = cfg.cells_per_shard
    d_tot = cfg.num_shards
    ax = cfg.axis_name
    dp = cfg.dp_axis_name
    axes_all = (ax, dp) if dp else ax

    def dpsum(x):
        """Merge per-replica partial slab deposits / counts (no-op 1D)."""
        return lax.psum(x, dp) if dp else x

    h = cfg.halo
    hw = h + 2  # +1 smoothing stencil, +1 CIC right node
    ext_n = c + 2 * hw + 1
    perm_r, perm_l = ring_perms(d_tot)

    def smooth_own(f_own):
        """Periodic binomial smoother on a slab-sharded field: radius-1
        stencil via a 1-node halo (equals ops.smooth_periodic globally)."""
        left = lax.ppermute(f_own[-1:], ax, perm_r)
        right = lax.ppermute(f_own[:1], ax, perm_l)
        ext = jnp.concatenate([left, f_own, right])
        return 0.25 * (ext[:-2] + 2.0 * ext[1:-1] + ext[2:])

    def smooth_valid(ext):
        """Binomial smooth of an extended slab; valid on the interior, so the
        result covers [lo - hw + 1, lo + c + hw - 1]."""
        return 0.25 * (ext[:-2] + 2.0 * ext[1:-1] + ext[2:])

    def clamp_loc(pl):
        return jnp.clip(pl, -float(h), float(c + h))

    use_fused = cfg.backend == "fused" or (
        cfg.backend == "auto" and jax.default_backend() == "tpu"
    )
    if cfg.backend not in ("auto", "fused", "composed"):
        raise ValueError(f"unknown backend {cfg.backend!r}")
    if not use_fused and cfg.finalize_field != "last":
        raise ValueError(
            "finalize_field != 'last' requires the fused backend (the "
            "composed path returns the last Picard iterate's arrays and "
            "has no finalize sweep to redirect); backend='auto' resolves "
            "to composed off-TPU — set backend='fused' explicitly (it "
            "works in CPU interpret mode too)")
    # clamp bounds in shifted (halo/deposit) coordinates: xi in [-h, c+h]
    clamp_lo_s = float(hw - h)
    clamp_hi_s = float(c + h + hw)

    def slab_deposit(pl, val):
        ext = deposit(
            clamp_loc(pl) + hw, val, ext_n,
            periodic=False, method=cfg.deposit_method,
        )
        return dpsum(halo_fold(ext, c, hw, ax, perm_r, perm_l))

    def smoothed_ext(es):
        """Halo-extend (+ smooth) the field guess in the shifted deposit
        coordinate system (ext_n nodes). With smoothing, the end nodes
        are zero padding outside the clamp range — never gathered."""
        e_ext = halo_extend(es, hw, ax, perm_r, perm_l)
        if not cfg.smooth:
            return e_ext
        z = jnp.zeros((1,), e_ext.dtype)
        return jnp.concatenate([z, smooth_valid(e_ext), z])

    def ampere(es, jh, e0):
        # Ampere advance (pypic.py:283): the mean is a psum, the smoother
        # a 1-node halo — no global grid anywhere.
        j_mean = lax.psum(jnp.sum(jh), ax) / ng
        e1 = e0 + (dt / EPSILON_0) * (
            j_mean - (smooth_own(jh) if cfg.smooth else jh)
        )
        eh = 0.5 * (e1 + e0)
        r = lax.psum(jnp.sum((es - eh) ** 2), ax)
        return e1, eh, r

    def cond(carry):
        # shared by both backends (their carries differ in length):
        # residual and iteration count ride at the end
        return (carry[-2] > cfg.tol) & (carry[-1] < cfg.maxiter)

    def mix(es, eh, k, aux):
        """Next Picard iterate from the map output eh (ops.accel): the
        secant inner products psum over the slab axis, so mixing the
        slab-sharded field equals mixing the global one. Fields are
        replicated across the dp axis — no dp psum needed."""
        from ..ops.accel import anderson2_mix, anderson_mix, damped_mix

        if cfg.picard_accel == "anderson":
            return anderson_mix(es, eh, k, aux, psum_axis=ax)
        if cfg.picard_accel == "anderson2":
            return anderson2_mix(es, eh, k, aux, psum_axis=ax)
        if cfg.picard_accel == "damped":
            return damped_mix(es, eh, k, aux)
        return eh, aux

    def init_guess(e0, e_prev, e_prev2):
        if cfg.picard_init == "extrapolate":
            return e0 + 0.5 * (e0 - e_prev)
        if cfg.picard_init == "extrapolate2":
            return 0.125 * (15.0 * e0 - 10.0 * e_prev + 3.0 * e_prev2)
        return e0

    emit_v = cfg.finalize == "iterate"
    share = cfg.window_share == "shared"
    # finalize_field history: the last Picard map outputs ride the carry
    # (slab-sharded like every field leaf); 'iterate' has no finalize
    # sweep to redirect, so the history is skipped (engines.implicit
    # semantics).
    keep_eh = cfg.finalize_field in ("mean2", "map", "aitken") and not emit_v
    keep_eh2 = cfg.finalize_field == "aitken" and not emit_v

    def make_body_composed(p0l, v0, w, e0, qm):
        """Picard map as individual ops, closing over this micro-step's
        start-of-step arrays (local coordinates)."""

        def body_composed(carry):
            es, psl, _, _, _, aux, _, k = carry
            # Gather the smoothed field guess at the position guess
            # (pypic.py:261) from the halo-extended slab.
            e_ext = halo_extend(es, hw, ax, perm_r, perm_l)
            if cfg.smooth:
                g_ext, off = smooth_valid(e_ext), hw - 1
            else:
                g_ext, off = e_ext, hw
            e_p = gather(g_ext, clamp_loc(psl) + off, periodic=False)
            # Crank-Nicolson update in slab coordinates (pypic.py:264-265).
            accel = qm * e_p
            p1l = p0l + dt_dx * v0 + (0.5 * dt * dt_dx) * accel
            v1 = v0 + dt * accel
            phl = 0.5 * (p0l + p1l)
            vh = 0.5 * (v0 + v1)
            jh = slab_deposit(phl, w * vh)
            j1 = slab_deposit(p1l, w * v1)
            e1, eh, r = ampere(es, jh, e0)
            es_next, aux = mix(es, eh, k, aux)
            return es_next, phl, (p1l, v1), e1, j1, aux, r, k + 1

        return body_composed

    def make_body_fused(p0s_b, v0_b, w_b, e0, n_cap, qm):
        """Fused Pallas Picard map, closing over this micro-step's blocked
        start-of-step arrays (shifted deposit coordinates)."""

        def body_fused(carry):
            from ..ops.pallas_cic import picard_iteration_ext_pallas

            es, pss = carry[0], carry[1]  # pss: blocked shifted iterate
            outs = picard_iteration_ext_pallas(
                smoothed_ext(es), pss, p0s_b, v0_b, w_b, ext_n,
                qm=qm, dt=dt, dx=dx, lo=clamp_lo_s, hi=clamp_hi_s,
                emit_v=emit_v, n_valid=n_cap, share_window=share,
            )
            if share:
                ncl = carry[2] + outs[-1]
                outs = outs[:-1]
            else:
                ncl = carry[2]
            jh = dpsum(halo_fold(outs[-1], c, hw, ax, perm_r, perm_l))
            e1, eh, r = ampere(es, jh, e0)
            es_next, aux = mix(es, eh, carry[-1], carry[-3])
            if emit_v:
                return (es_next, outs[0], ncl, outs[1], e1, jh, aux, r,
                        carry[-1] + 1)
            if keep_eh:
                # shift the map-output history: carry[3] = eh_k, [4] = eh_{k-1}
                # (+ [5] = eh_{k-2} for aitken)
                hist = (eh, carry[3]) + ((carry[4],) if keep_eh2 else ())
                return (es_next, outs[0], ncl) + hist + (
                    e1, jh, aux, r, carry[-1] + 1)
            return es_next, outs[0], ncl, e1, jh, aux, r, carry[-1] + 1

        return body_fused

    def _hist0(es0):
        """Carry seeds for the finalize_field map-output history."""
        if not keep_eh:
            return ()
        return (es0, es0) + ((es0,) if keep_eh2 else ())

    def _unpack_fused(out):
        """Unpack the non-emit_v fused Picard carry and resolve the field
        the finalize sweep gathers with (engines.implicit.step_fused
        semantics; the aitken ρ inner products psum over the slab axis so
        the slab-sharded Δ² extrapolation equals the global one — fields
        are replicated across the dp axis, no dp psum needed)."""
        es, pss, ncl = out[0], out[1], out[2]
        e1, jh, r, k = out[-5], out[-4], out[-2], out[-1]
        ef = es
        if keep_eh:
            ehl, ehp = out[3], out[4]
            if cfg.finalize_field == "map":
                ef = ehl
            elif cfg.finalize_field == "mean2":
                # at k == 1 ehp still holds the seed es0 (a prediction, not
                # a map output) — fall back to the single output
                ef = jnp.where(k > 1, 0.5 * (ehl + ehp), ehl)
            else:  # 'aitken'
                ehpp = out[5]
                d1 = ehl - ehp
                d2 = ehp - ehpp
                den = lax.psum(jnp.sum(d2 * d2), ax)
                rho = lax.psum(jnp.sum(d1 * d2), ax)
                rho = rho / jnp.where(den > 0.0, den, 1.0)
                rho = jnp.clip(rho, -0.95, 0.95)
                trust = (k > 2) & (den > 0.0)
                corr = (rho / (1.0 - rho)) * d1
                ef = ehl + jnp.where(trust, corr, jnp.zeros_like(corr))
        return es, pss, ncl, ef, e1, jh, r, k

    def local_step(state: DomainImplicitState):
        d = lax.axis_index(ax)
        lo = d.astype(state.p.dtype) * c
        alive = state.alive
        # Dead slots are inert without masking copies: their deposit weight
        # w is zero, kernel gathers clamp to the halo range, and every
        # downstream consumer (migration routing, metrics, clamp counters)
        # masks by `alive` — so p/v carry stale-but-finite values in dead
        # slots instead of paying 4 full-array where-passes per step
        # (measured ~2% at 1e8 on v5e — XLA fused most of the wheres away,
        # but the simpler dataflow also keeps new consumers honest about
        # masking at the use site).
        p0l = state.p - lo
        v0 = state.v
        e0 = state.e  # (c,) own slab under shard_map
        qm = state.q / state.m
        w = jnp.where(alive, state.q * (cfg.p2c / dx), 0.0)

        es0 = init_guess(e0, state.e_prev, state.e_prev2)
        from ..ops.accel import mix_init

        aux0 = mix_init(e0, cfg.picard_accel)
        if use_fused:
            from ..ops.pallas_cic import (
                block_particles,
                picard_finalize_ext_nodep_pallas,
                picard_finalize_ext_pallas,
                unblock_particles,
            )

            p0s = p0l + hw
            # Block once per step; the Picard loop carries the position
            # iterate in the kernels' blocked layout (no pad/slice copies
            # per pass — see engines.implicit.step_fused).
            n_cap = p0s.shape[0]
            (p0s_b, v0_b, w_b), _ = block_particles([p0s, v0, w])
            body_fused = make_body_fused(p0s_b, v0_b, w_b, e0, n_cap, qm)
            if share:
                # free-streaming midpoint seed keeps the shared-window
                # deposit offset at an acceleration displacement
                ps_seed = p0s_b + (0.5 * dt_dx) * v0_b
            else:
                ps_seed = p0s_b
            ncl0 = jnp.asarray(0, jnp.int32)
            if emit_v:
                carry0 = (
                    es0, ps_seed, ncl0, v0_b, e0, state.j, aux0,
                    jnp.asarray(jnp.inf, e0.dtype), jnp.asarray(0, jnp.int32),
                )
                es, pss, ncl, v1_b, e1, jh, _, r, k = lax.while_loop(
                    cond, body_fused, carry0
                )
                # Last Picard iterate, no extra sweep (pypic.py:293-295):
                # p1 = p0 + dt/dx (v0 + v1)/2 elementwise; state.j holds the
                # half-step current that drove the Ampere advance; the exact
                # mean of the skipped full-step deposit is w sum(v1)/ng.
                v1 = unblock_particles(v1_b, n_cap)
                p1l = p0l + (0.5 * dt_dx) * (v0 + v1)
                j1 = jh
                mean_j1 = lax.psum(jnp.sum(w * v1), axes_all) / ng
            else:
                carry0 = (es0, ps_seed, ncl0) + _hist0(es0) + (
                    e0, state.j, aux0,
                    jnp.asarray(jnp.inf, e0.dtype), jnp.asarray(0, jnp.int32),
                )
                es, pss, ncl, ef, e1, jh, r, k = _unpack_fused(
                    lax.while_loop(cond, body_fused, carry0)
                )
                # finalize from the converged field (engines.implicit fused
                # semantics): one extra sweep yields (p1, v1). Stats mode:
                # the kernel wraps positions to GLOBAL coordinates and
                # accumulates (sum w*v1, sum_alive v1^2, halo-clamp count)
                # in-sweep, so no separate wrap/reduction passes below.
                lo_shift = lo - hw
                if cfg.finalize == "converged":
                    p1_b, v1_b, st = picard_finalize_ext_nodep_pallas(
                        smoothed_ext(ef), pss, p0s_b, v0_b, ext_n,
                        qm=qm, dt=dt, dx=dx, lo=clamp_lo_s, hi=clamp_hi_s,
                        n_valid=n_cap, w=w_b, lo_shift=lo_shift, ng=ng,
                    )
                    j1 = jh
                    mean_j1 = lax.psum(jnp.sum(st[0, :]), axes_all) / ng
                else:  # 'converged-deposit'
                    p1_b, v1_b, j1_ext, st = picard_finalize_ext_pallas(
                        smoothed_ext(ef), pss, p0s_b, v0_b, w_b, ext_n,
                        qm=qm, dt=dt, dx=dx, lo=clamp_lo_s, hi=clamp_hi_s,
                        n_valid=n_cap, lo_shift=lo_shift, ng=ng,
                    )
                    j1 = dpsum(halo_fold(j1_ext, c, hw, ax, perm_r, perm_l))
                    mean_j1 = lax.psum(jnp.sum(j1), ax) / ng
                p1 = unblock_particles(p1_b, n_cap)  # global, wrapped
                v1 = unblock_particles(v1_b, n_cap)
                kin_local = jnp.sum(st[1, :])
                # row 2 holds per-lane partial counts (each integer-exact
                # in f32); sum in int32 so the total stays exact past 2^24
                clamp_local = jnp.sum(st[2, :].astype(jnp.int32))
        else:
            body_composed = make_body_composed(p0l, v0, w, e0, qm)
            carry0 = (
                es0, p0l, (p0l, v0), e0, state.j, aux0,
                jnp.asarray(jnp.inf, e0.dtype), jnp.asarray(0, jnp.int32),
            )
            _, _, (p1l, v1), e1, j1, _, r, k = lax.while_loop(
                cond, body_composed, carry0
            )
            mean_j1 = lax.psum(jnp.sum(j1), ax) / ng

        if use_fused and not emit_v:
            n_halo_clamped = lax.psum(clamp_local, axes_all)
            kin_sum = lax.psum(kin_local, axes_all)
        else:
            n_halo_clamped = lax.psum(
                jnp.sum(
                    (alive & ((p1l < -h) | (p1l > c + h))).astype(jnp.int32)
                ),
                axes_all,
            )
            kin_sum = lax.psum(jnp.sum(jnp.where(alive, v1 * v1, 0.0)),
                               axes_all)
            # Wrap to global coordinates (dead slots wrap too — finite
            # garbage, masked by `alive` inside migration).
            p1 = jnp.mod(p1l + lo, ng)
        (p2, v2), alive1, n_migrated, n_dropped = migrate(
            [p1, v1], alive, d,
            ng=ng, cells_per_shard=c, num_shards=d_tot,
            cap=cfg.migrate_cap, ax=ax,
            # replicas must agree on the round count or the whole-mesh
            # ppermute rendezvous deadlocks (see domain.migrate count_axes)
            count_axes=axes_all,
        )

        metrics = StepMetrics(
            field_energy=0.5 * EPSILON_0 * dx * lax.psum(jnp.sum(e1 * e1), ax),
            kinetic_energy=0.5 * cfg.p2c * state.m * kin_sum,
            current_bias=mean_j1,
            picard_iters=k,
            picard_residual=r,
            n_alive=lax.psum(jnp.sum(alive1.astype(jnp.int32)), axes_all),
            n_migrated=dpsum(n_migrated),
            picard_clamped=(
                lax.psum(ncl, axes_all) if (use_fused and share)
                else jnp.asarray(0, jnp.int32)
            ),
            n_dropped=dpsum(n_dropped),
            n_halo_clamped=n_halo_clamped,
        )
        new_state = state.replace(
            p=p2, v=v2, alive=alive1, e=e1, j=j1, e_prev=e0,
            e_prev2=state.e_prev, step=state.step + 1
        )
        return new_state, metrics

    def local_superstep(state: DomainImplicitState):
        """k_mig micro-steps with ONE wrap + migrate at the end.

        Micro-steps carry positions raw in this superstep's slab frame
        (blocked shifted coordinates on the fused path, local coordinates
        on the composed one): the extended-slab grid ops are correct for
        any excursion within the halo, and excursions beyond it are
        clamped-for-grid-work + counted exactly as in the per-step path.
        Only the last micro-step converts to global coordinates (in-kernel
        on the fused stats path) and routes particles to their owners."""
        d = lax.axis_index(ax)
        lo = d.astype(state.p.dtype) * c
        alive = state.alive
        qm = state.q / state.m
        w = jnp.where(alive, state.q * (cfg.p2c / dx), 0.0)
        n_alive0 = lax.psum(jnp.sum(alive.astype(jnp.int32)), axes_all)
        zero_i = jnp.asarray(0, jnp.int32)
        from ..ops.accel import mix_init

        def metrics_of(e1, kin_sum, mean_j1, k, r, nhc, ncl):
            return StepMetrics(
                field_energy=0.5 * EPSILON_0 * dx
                * lax.psum(jnp.sum(e1 * e1), ax),
                kinetic_energy=0.5 * cfg.p2c * state.m * kin_sum,
                current_bias=mean_j1,
                picard_iters=k,
                picard_residual=r,
                n_alive=n_alive0,
                n_migrated=zero_i,
                n_dropped=zero_i,
                n_halo_clamped=nhc,
                picard_clamped=(
                    lax.psum(ncl, axes_all) if (use_fused and share)
                    else zero_i
                ),
            )

        if use_fused:
            from ..ops.pallas_cic import (
                block_particles,
                picard_finalize_ext_nodep_pallas,
                picard_finalize_ext_pallas,
                unblock_particles,
            )

            n_cap = state.p.shape[0]
            (p_b0, v_b0, w_b), _ = block_particles(
                [state.p - lo + hw, state.v, w]
            )
            alive_b = w_b != 0.0

            def micro(p_b, v_b, e0, j_in, e_prev, e_prev2, *, last):
                es0 = init_guess(e0, e_prev, e_prev2)
                aux0 = mix_init(e0, cfg.picard_accel)
                body = make_body_fused(p_b, v_b, w_b, e0, n_cap, qm)
                ps_seed = p_b + (0.5 * dt_dx) * v_b if share else p_b
                inf_r = jnp.asarray(jnp.inf, e0.dtype)
                if emit_v:
                    carry0 = (es0, ps_seed, zero_i, v_b, e0, j_in, aux0,
                              inf_r, zero_i)
                    es, pss, ncl, v1_b, e1, jh, _, r, k = lax.while_loop(
                        cond, body, carry0
                    )
                    # Last Picard iterate (pypic.py:293-295), in blocked
                    # shifted coordinates; state.j = half-step current.
                    p1_b = p_b + (0.5 * dt_dx) * (v_b + v1_b)
                    j1 = jh
                    mean_j1 = lax.psum(jnp.sum(w_b * v1_b), axes_all) / ng
                    kin_sum = lax.psum(
                        jnp.sum(jnp.where(alive_b, v1_b * v1_b, 0.0)),
                        axes_all,
                    )
                    nhc = lax.psum(
                        jnp.sum((alive_b & ((p1_b < clamp_lo_s)
                                            | (p1_b > clamp_hi_s))
                                 ).astype(jnp.int32)),
                        axes_all,
                    )
                else:
                    carry0 = (es0, ps_seed, zero_i) + _hist0(es0) + (
                        e0, j_in, aux0, inf_r, zero_i)
                    es, pss, ncl, ef, e1, jh, r, k = _unpack_fused(
                        lax.while_loop(cond, body, carry0)
                    )
                    # Finalize from the converged field; ng=0 keeps the
                    # position raw/shifted on non-last micro-steps (the
                    # stats rows accumulate either way).
                    lo_shift = (lo - hw) if last else jnp.zeros_like(lo)
                    ng_k = ng if last else 0
                    if cfg.finalize == "converged":
                        p1_b, v1_b, st = picard_finalize_ext_nodep_pallas(
                            smoothed_ext(ef), pss, p_b, v_b, ext_n,
                            qm=qm, dt=dt, dx=dx, lo=clamp_lo_s,
                            hi=clamp_hi_s, n_valid=n_cap, w=w_b,
                            lo_shift=lo_shift, ng=ng_k,
                        )
                        j1 = jh
                        mean_j1 = lax.psum(jnp.sum(st[0, :]), axes_all) / ng
                    else:  # 'converged-deposit'
                        p1_b, v1_b, j1_ext, st = picard_finalize_ext_pallas(
                            smoothed_ext(ef), pss, p_b, v_b, w_b, ext_n,
                            qm=qm, dt=dt, dx=dx, lo=clamp_lo_s,
                            hi=clamp_hi_s, n_valid=n_cap,
                            lo_shift=lo_shift, ng=ng_k,
                        )
                        j1 = dpsum(
                            halo_fold(j1_ext, c, hw, ax, perm_r, perm_l)
                        )
                        mean_j1 = lax.psum(jnp.sum(j1), ax) / ng
                    kin_sum = lax.psum(jnp.sum(st[1, :]), axes_all)
                    nhc = lax.psum(
                        jnp.sum(st[2, :].astype(jnp.int32)), axes_all
                    )
                met = metrics_of(e1, kin_sum, mean_j1, k, r, nhc, ncl)
                return p1_b, v1_b, e1, j1, met

            carry0 = (p_b0, v_b0, state.e, state.j, state.e_prev,
                      state.e_prev2)
            if k_mig > 1:
                def scan_body(cr, _):
                    p_b, v_b, e, j, ep, ep2 = cr
                    p1_b, v1_b, e1, j1, met = micro(
                        p_b, v_b, e, j, ep, ep2, last=False
                    )
                    return (p1_b, v1_b, e1, j1, e, ep), met

                carry, ms = lax.scan(
                    scan_body, carry0, None, length=k_mig - 1
                )
            else:
                carry, ms = carry0, None
            p_b, v_b, e_c, j_c, ep_c, ep2_c = carry
            p1_b, v1_b, e1, j1, met_last = micro(
                p_b, v_b, e_c, j_c, ep_c, ep2_c, last=True
            )
            v1 = unblock_particles(v1_b, n_cap)
            if emit_v:
                # raw shifted -> global wrap (the converged finalize
                # kernels did this in-kernel via lo_shift/ng)
                p1 = jnp.mod(unblock_particles(p1_b, n_cap) + (lo - hw), ng)
            else:
                p1 = unblock_particles(p1_b, n_cap)
        else:
            def micro(p_l, v_c, e0, j_in, e_prev, e_prev2, *, last):
                del last  # composed path wraps outside the micro-step
                es0 = init_guess(e0, e_prev, e_prev2)
                aux0 = mix_init(e0, cfg.picard_accel)
                body = make_body_composed(p_l, v_c, w, e0, qm)
                carry0 = (
                    es0, p_l, (p_l, v_c), e0, j_in, aux0,
                    jnp.asarray(jnp.inf, e0.dtype), zero_i,
                )
                _, _, (p1l, v1), e1, j1, _, r, k = lax.while_loop(
                    cond, body, carry0
                )
                mean_j1 = lax.psum(jnp.sum(j1), ax) / ng
                kin_sum = lax.psum(
                    jnp.sum(jnp.where(alive, v1 * v1, 0.0)), axes_all
                )
                nhc = lax.psum(
                    jnp.sum((alive & ((p1l < -h) | (p1l > c + h))
                             ).astype(jnp.int32)),
                    axes_all,
                )
                met = metrics_of(e1, kin_sum, mean_j1, k, r, nhc, zero_i)
                return p1l, v1, e1, j1, met

            carry0 = (state.p - lo, state.v, state.e, state.j,
                      state.e_prev, state.e_prev2)
            if k_mig > 1:
                def scan_body(cr, _):
                    p_l, v_c, e, j, ep, ep2 = cr
                    p1l, v1, e1, j1, met = micro(
                        p_l, v_c, e, j, ep, ep2, last=False
                    )
                    return (p1l, v1, e1, j1, e, ep), met

                carry, ms = lax.scan(
                    scan_body, carry0, None, length=k_mig - 1
                )
            else:
                carry, ms = carry0, None
            p_l, v_c, e_c, j_c, ep_c, ep2_c = carry
            p1l, v1, e1, j1, met_last = micro(
                p_l, v_c, e_c, j_c, ep_c, ep2_c, last=True
            )
            p1 = jnp.mod(p1l + lo, ng)

        (p2, v2), alive1, n_migrated, n_dropped = migrate(
            [p1, v1], alive, d,
            ng=ng, cells_per_shard=c, num_shards=d_tot,
            cap=cfg.migrate_cap, ax=ax,
            count_axes=axes_all,
        )
        met_last = met_last._replace(
            n_migrated=dpsum(n_migrated),
            n_dropped=dpsum(n_dropped),
            n_alive=lax.psum(jnp.sum(alive1.astype(jnp.int32)), axes_all),
        )
        if ms is None:
            metrics = jax.tree.map(lambda x: jnp.asarray(x)[None], met_last)
        else:
            metrics = jax.tree.map(
                lambda s, x: jnp.concatenate([s, jnp.asarray(x)[None]]),
                ms, met_last,
            )
        new_state = state.replace(
            p=p2, v=v2, alive=alive1, e=e1, j=j1, e_prev=e_c,
            e_prev2=ep_c, step=state.step + k_mig,
        )
        return new_state, metrics

    spec = _state_specs(cfg)
    # jit the shard_mapped step: an UN-jitted shard_map dispatches
    # eagerly op-by-op per shard (~1000x slower on the virtual CPU mesh);
    # callers that wrap it again in jax.jit / lax.scan are unaffected
    # (nested jit is free).
    return jax.jit(shard_map(
        local_step if k_mig is None else local_superstep,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, P()),
        check_vma=False,
    ))
