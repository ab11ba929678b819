"""Census of the XLA collectives each sharded step function actually
compiles to, on an 8-device virtual CPU mesh.

Grounds SCALING.md: rather than hand-waving about "a psum here, a halo
there", this lowers each multi-chip step with jax.jit(...).lower(...).
compile() and greps the optimized HLO for collective ops, reporting the
op kind, result shape, payload bytes, and which computation (while body =
per-Picard/Newton-iteration vs top level = per-step) it lives in.

Usage: python scratch/collective_census.py [ng] [n_particles]
"""

import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402

NG = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2 ** 17
NDEV = 8

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "c64": 8, "c128": 16}

_COLLECTIVES = ("all-reduce", "collective-permute", "all-gather",
                "all-to-all", "reduce-scatter", "collective-broadcast")


def _shape_bytes(shape_str):
    """'f32[128,16]' -> (dtype, nelems, bytes); tuples handled upstream."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return None
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return dt, n, n * _DTYPE_BYTES.get(dt, 4)


def census(name, fn, *args):
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    # map each instruction to its enclosing computation
    comp = None
    rows = []
    for line in hlo.splitlines():
        if line.lstrip().startswith(("ENTRY", "%")) and "{" in line and "->" in line:
            mname = re.search(r"%?([\w.\-]+)\s*\(", line)
            if mname:
                comp = mname.group(1)
        for op in _COLLECTIVES:
            # e.g.  %x = (f32[18]) all-reduce(...)   or  f32[18]{0} all-reduce(
            if re.search(rf"\b{op}(-start)?\(", line):
                shapes = re.findall(r"([a-z0-9]+\[[0-9,]*\])", line.split("=", 1)[-1]
                                    .split(op)[0])
                total = 0
                parts = []
                for s in shapes:
                    sb = _shape_bytes(s)
                    if sb:
                        total += sb[2]
                        parts.append(s)
                where = comp or "?"
                # XLA names while-loop body computations wide.region_* /
                # region_*; collectives there run once per loop iteration
                # (Picard / Newton / migration-hop), not once per step.
                in_loop = ("while" in where or "body" in where
                           or "cond" in where or "region" in where)
                rows.append((op, "+".join(parts) or "?", total, where,
                             in_loop))
    print(f"\n== {name} (ng={NG}, n={N}, {NDEV} shards) ==")
    if not rows:
        print("  (no collectives)")
    agg = {}
    for op, shp, b, where, in_loop in rows:
        key = (op, shp, in_loop)
        agg.setdefault(key, [0, b, where])[0] += 1
    for (op, shp, in_loop), (cnt, b, where) in sorted(agg.items()):
        tag = "per-loop-iteration" if in_loop else "per-step"
        print(f"  {cnt:3d}x {op:20s} {shp:24s} {b:8d} B  [{tag}: {where}]")
    return rows


def main():
    from pypic_tpu.constants import E_CHARGE, K_BOLTZMANN, M_ELECTRON
    from pypic_tpu.engines import implicit
    from pypic_tpu.grid import GridSpec
    from pypic_tpu import initialize
    from pypic_tpu.parallel import (domain, domain_implicit as di,
                                    domain_sheath as ds,
                                    make_data_parallel_step, make_mesh,
                                    shard_state)

    density, te_k = 1e10, 0.1 * 11600.0
    from pypic_tpu import constants as c
    debye = np.sqrt(c.K_BOLTZMANN * te_k * c.EPSILON_0
                    / c.E_CHARGE ** 2 / density)
    grid = GridSpec(NG, 15.0 * debye, "periodic")
    x, v, p = initialize.initialize_periodic(
        "two-stream", N, density, 1, 0.05, grid, te_k, te_k, seed=2)
    dt = 0.1 / p.wp
    mesh = make_mesh(NDEV, axis="slabs")
    mcap = max(256, 8 * N // NG)

    # flagship: domain-decomposed implicit CN-Picard, conserving envelope
    icfg = di.DomainImplicitConfig(
        grid, dt, p.p2c, num_shards=NDEV, tol=1e-30, maxiter=4,
        halo=2, migrate_cap=mcap)
    istate = di.shard_state(
        di.init_state(x, v, -E_CHARGE, M_ELECTRON, icfg), mesh, icfg)
    census("domain_implicit.make_step (flagship, fixed-4 Picard)",
           di.make_step(icfg, mesh), istate)

    # migration-amortized superstep, k=4
    import dataclasses
    icfg4 = dataclasses.replace(icfg, halo=8)
    census("domain_implicit.make_superstep k=4",
           di.make_superstep(icfg4, mesh, 4), istate)

    # explicit domain step
    dcfg = domain.DomainConfig(grid, dt, p.p2c, num_shards=NDEV,
                               migrate_cap=mcap)
    dstate = domain.shard_state(
        domain.init_state(x, v, -E_CHARGE, M_ELECTRON, dcfg), mesh, dcfg)
    census("domain.make_step (explicit)", domain.make_step(dcfg, mesh),
           dstate)

    # data-parallel implicit (replicated grid, psum'd deposits)
    pmesh = make_mesh(NDEV)
    cfg_dp = implicit.ImplicitConfig(grid, dt, p.p2c, tol=1e-30, maxiter=4,
                                     backend="composed",
                                     axis_name="particles")
    st = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg_dp)
    census("implicit data-parallel step",
           make_data_parallel_step(implicit.make_step, cfg_dp, pmesh,
                                   example_state=st),
           shard_state(st, pmesh))

    # domain-decomposed sheath
    ng_s = NG
    dx_s = 1e-5
    grid_s = GridSpec(ng_s, dx_s * (ng_s - 1), "dirichlet-dirichlet")
    te = 10.0 * 11600.0
    dset = initialize.initialize_sheath(N, 1e19, 1.0, 0.0, grid_s, te, te,
                                        seed=0)
    scfg = ds.DomainSheathConfig(
        grid_s, 1e-12, grid_s.length * 1e19 / N,
        kbte=K_BOLTZMANN * te, kbti=K_BOLTZMANN * te,
        num_shards=NDEV, halo=2, migrate_cap=mcap, maxiter=5)
    sstate = ds.shard_state(
        ds.init_state(dset["x"], dset["v"], dset["q"], dset["m"],
                      dset["species"], scfg, seed=1), mesh, scfg)
    census("domain_sheath.make_step", ds.make_step(scfg, mesh), sstate)


if __name__ == "__main__":
    main()
