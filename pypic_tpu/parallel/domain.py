"""Spatial domain decomposition: slab-sharded grid + particle migration.

The capability BASELINE.json configs[4] adds over the reference (which is
single-process, SURVEY.md §2.6): the 1D periodic domain is split into one
slab of ``cells_per_shard`` cells per device;

* each device **deposits only onto its own slab** (+ one halo node per side
  for the CIC right-neighbor contribution at the slab edge) — the halo nodes
  ride a ``ppermute`` to the neighbor instead of an O(ng) psum, so grid
  memory and reduction cost per device stay O(ng/D);
* the (small) global field is assembled with an ``all_gather`` of the owned
  slabs and solved replicated — the right call for the reference's grid
  sizes (Ng 40-800); a distributed solve slot is left for ng >> 1e5;
* particles live on the device owning their slab; after the push each
  crossing particle is packed into a fixed-capacity neighbor bucket and
  ``ppermute``-d left or right, then placed into free slots (fixed-shape
  ragged all-to-all). Particles that would cross more than one slab per step
  or overflow a bucket are *counted and dropped* — detected, never silent
  (SURVEY.md §7 hard part 5); size ``migrate_cap`` and dt accordingly.

The explicit periodic cycle (PIC_L.py:762-768) is the carrier engine; the
same halo/migration machinery generalizes to the other engines.
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
from ..push import leapfrog_push

shard_map = jax.shard_map


@dataclasses.dataclass(frozen=True)
class DomainConfig:
    grid: GridSpec  # global periodic grid; ng must divide by num_shards
    dt: float
    p2c: float
    num_shards: int
    migrate_cap: int = 4096  # per-direction bucket size per step
    axis_name: str = "slabs"
    deposit_method: str = "auto"

    def __post_init__(self):
        object.__setattr__(self, "dt", float(self.dt))
        object.__setattr__(self, "p2c", float(self.p2c))
        if self.grid.ng % self.num_shards:
            raise ValueError(
                f"ng={self.grid.ng} not divisible by {self.num_shards} shards"
            )

    @property
    def cells_per_shard(self) -> int:
        return self.grid.ng // self.num_shards


class DomainState(struct.PyTreeNode):
    """Per-shard fixed-capacity particles; global grid-coordinate positions."""

    p: jax.Array  # (num_shards*capacity,) global grid coords (sharded dim 0)
    v: jax.Array  # same sharding
    alive: jax.Array  # bool
    q: jax.Array  # () charge (single species)
    m: jax.Array  # ()
    step: jax.Array  # () int32


class StepMetrics(NamedTuple):
    field_energy: jax.Array
    kinetic_energy: jax.Array
    n_alive: jax.Array
    n_migrated: jax.Array  # particles exchanged this step (global)
    n_dropped: jax.Array  # bucket overflow / multi-slab hops (global)


def init_state(x, v, q, m, cfg: DomainConfig, capacity_factor: float = 1.5):
    """Distribute host arrays onto shards by slab ownership.

    Returns a host-side DomainState (leading dim num_shards*capacity) laid
    out so that a reshape to (num_shards, capacity) puts each particle on its
    owning shard; feed through ``shard_state`` before stepping.
    """
    grid = cfg.grid
    x = np.asarray(x)
    v = np.asarray(v)
    p = x / grid.dx
    cell = np.floor(p).astype(np.int64) % grid.ng
    owner = cell // cfg.cells_per_shard
    counts = np.bincount(owner, minlength=cfg.num_shards)
    capacity = int(np.ceil(counts.max() * capacity_factor))
    n_s = cfg.num_shards
    p_out = np.zeros((n_s, capacity), np.float32)
    v_out = np.zeros((n_s, capacity), np.float32)
    alive = np.zeros((n_s, capacity), bool)
    for d in range(n_s):
        sel = owner == d
        k = int(sel.sum())
        if k > capacity:
            raise ValueError("capacity_factor too small")
        p_out[d, :k] = p[sel]
        v_out[d, :k] = v[sel]
        alive[d, :k] = True
    return DomainState(
        p=jnp.asarray(p_out.reshape(-1)),
        v=jnp.asarray(v_out.reshape(-1)),
        alive=jnp.asarray(alive.reshape(-1)),
        q=jnp.asarray(q, jnp.float32),
        m=jnp.asarray(m, jnp.float32),
        step=jnp.asarray(0, jnp.int32),
    )


def shard_state(state: DomainState, mesh: Mesh, cfg: DomainConfig):
    spec = DomainState(
        p=P(cfg.axis_name), v=P(cfg.axis_name), alive=P(cfg.axis_name),
        q=P(), m=P(), step=P(),
    )
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, jax.sharding.NamedSharding(mesh, s)),
        state, spec,
    )


def make_step(cfg: DomainConfig, mesh: Mesh):
    """Build the shard_mapped domain-decomposed explicit step."""
    grid = cfg.grid
    ng = grid.ng
    dx = grid.dx
    dt = cfg.dt
    dt_dx = dt / dx
    c = cfg.cells_per_shard
    d_tot = cfg.num_shards
    ax = cfg.axis_name
    cap_mig = cfg.migrate_cap
    perm_r = [(i, (i + 1) % d_tot) for i in range(d_tot)]
    perm_l = [(i, (i - 1) % d_tot) for i in range(d_tot)]

    from ..utils import pack_rows, place_rows

    def _send(mask, fields, perm):
        """Pack up to cap_mig masked rows, ppermute them with a valid count."""
        bufs, n_valid, overflow = pack_rows(mask, fields, cap_mig)
        out = lax.ppermute(jnp.concatenate(
            [b.astype(jnp.float32) for b in bufs]
            + [jnp.full((1,), n_valid, jnp.float32)]
        ), ax, perm)
        recv_bufs = [out[i * cap_mig:(i + 1) * cap_mig] for i in range(len(fields))]
        recv_n = out[-1].astype(jnp.int32)
        return recv_bufs, recv_n, overflow

    def _place(p, v, alive, recv_p, recv_v, recv_n):
        (p, v), take, placed = place_rows(
            ~alive, [recv_p, recv_v], recv_n, [p, v]
        )
        alive = alive | take
        return p, v, alive, recv_n - placed  # dropped if no free slots

    def local_step(state: DomainState):
        d = lax.axis_index(ax)
        p, v, alive = state.p, state.v, state.alive
        qm = state.q / state.m
        w = state.q * (cfg.p2c / dx)

        # --- slab deposit with one halo node (CIC right neighbor at edge)
        lo = d.astype(p.dtype) * c
        p_loc = jnp.where(alive, p - lo, 0.0)
        # edge case: global wrap for the last shard's right-edge deposits is
        # handled by the halo ppermute ring itself
        rho_ext = deposit(
            p_loc, jnp.where(alive, w, 0.0), c + 1,
            periodic=False, method=cfg.deposit_method,
        )
        halo_right = rho_ext[c]
        rho_own = rho_ext[:c].at[0].add(
            lax.ppermute(halo_right, ax, perm_r)
        )

        # --- replicated global field solve (ng small; all_gather is O(ng))
        rho_full = lax.all_gather(rho_own, ax, tiled=True)
        phi = solve_periodic_neutralized(rho_full, dx)
        phi = phi - jnp.max(phi)
        e_full = -grad_periodic(phi, dx)

        # --- gather + push + periodic wrap (global positions)
        e_p = jnp.where(alive, gather(e_full, p, periodic=True), 0.0)
        p1, v1 = leapfrog_push(p, v, e_p, qm, dt, dt_dx)
        p1 = jnp.mod(p1, ng)
        p1 = jnp.where(alive, p1, 0.0)
        v1 = jnp.where(alive, v1, 0.0)

        # --- migration to neighbor slabs. Predicates must be mutually
        # exclusive: with 1 or 2 shards the right and left neighbours
        # coincide (with d itself at D=1), and overlapping masks would
        # duplicate particles into both buckets.
        cell = jnp.clip(jnp.floor(p1).astype(jnp.int32), 0, ng - 1)
        dest = cell // c
        stay = alive & (dest == d)
        go_r = alive & ~stay & (dest == (d + 1) % d_tot)
        go_l = alive & ~stay & ~go_r & (dest == (d - 1) % d_tot)
        too_far = alive & ~(stay | go_r | go_l)

        (recv_p_r, recv_v_r), n_r, ovf_r = _send(go_r, (p1, v1), perm_r)
        (recv_p_l, recv_v_l), n_l, ovf_l = _send(go_l, (p1, v1), perm_l)

        alive1 = stay
        p2, v2, alive1, drop1 = _place(p1, v1, alive1, recv_p_r, recv_v_r, n_r)
        p2, v2, alive1, drop2 = _place(p2, v2, alive1, recv_p_l, recv_v_l, n_l)

        n_migrated = lax.psum(n_r + n_l, ax)
        n_dropped = lax.psum(
            ovf_r + ovf_l + drop1 + drop2 + jnp.sum(too_far.astype(jnp.int32)),
            ax,
        )

        metrics = StepMetrics(
            field_energy=0.5 * EPSILON_0 * dx * jnp.sum(e_full * e_full),
            kinetic_energy=lax.psum(
                0.5 * cfg.p2c * state.m * jnp.sum(jnp.where(alive, v * v, 0.0)),
                ax,
            ),
            n_alive=lax.psum(jnp.sum(alive1.astype(jnp.int32)), ax),
            n_migrated=n_migrated,
            n_dropped=n_dropped,
        )
        new_state = state.replace(
            p=p2, v=v2, alive=alive1, step=state.step + 1
        )
        return new_state, metrics

    state_spec = DomainState(
        p=P(ax), v=P(ax), alive=P(ax), q=P(), m=P(), step=P(),
    )
    return shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec,),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
