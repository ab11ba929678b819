#!/usr/bin/env python
"""Headline benchmark: particle pushes/sec/chip on the flagship implicit
engine at the reference's canonical Landau-damping workload scaled to 1e8
particles (run_pypic.py: pypic.main preset, pypic.py:846-855, at N=1e8
instead of 1e6).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured pushes/sec divided by the 1e9 north-star target
(BASELINE.json; the reference publishes no numbers and cannot run in this
image — it requires numba).

Timing notes: the axon TPU tunnel defers execution past block_until_ready,
so timings fetch a scalar to host; warmup uses the *same* static step count
as the timed run so compilation stays out of the measured region.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=None)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tol", type=float, default=1e-9,
                    help="Picard tolerance; 1e-9 measured at -1.6e-6 energy drift per "
                         "1e4 steps — 600x inside the north star (reference parity: 1e-3)")
    ap.add_argument("--drift-steps", type=int, default=0,
                    help="additionally measure energy drift over this many steps")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pypic_tpu.constants import (
        E_CHARGE, EPSILON_0, K_BOLTZMANN, M_ELECTRON,
    )
    from pypic_tpu.grid import GridSpec
    from pypic_tpu.engines import implicit
    from pypic_tpu.runner import run

    on_tpu = jax.default_backend() == "tpu"
    n = args.particles or (100_000_000 if on_tpu else 200_000)

    # Reference Landau preset (pypic.py:846-855).
    density = 1e5
    te = 100.0 * 11600.0
    ti = 0.1 * 11600.0
    ng = 200
    dt = 1e-5
    debye = np.sqrt(K_BOLTZMANN * te * EPSILON_0 / E_CHARGE**2 / density)
    length = 22.0 * debye
    grid = GridSpec(ng, length, "periodic")
    p2c = length * density / n

    print(f"bench: backend={jax.default_backend()} n={n:.2e} ng={ng} "
          f"steps={args.steps}", file=sys.stderr)

    # Device-side load of the Landau scenario: Maxwellian velocities and the
    # cosine density perturbation applied as a position displacement (same
    # perturbation amplitude as the reference's resampling loader).
    vth = np.sqrt(2.0 * K_BOLTZMANN * te / M_ELECTRON)
    key = jax.random.PRNGKey(1)
    kx, kv = jax.random.split(key)
    x = jax.random.uniform(kx, (n,), jnp.float32, 0.0, np.float32(length))
    v = jax.random.normal(kv, (n,), jnp.float32) * np.float32(vth / np.sqrt(2.0))
    k_pert = 2.0 * np.pi / length
    x = x + np.float32(0.8 / k_pert) * jnp.sin(k_pert * x) * 0.5

    cfg = implicit.ImplicitConfig(
        grid, dt, p2c, tol=args.tol, maxiter=50,
    )
    state = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
    step = implicit.make_step(cfg)

    t0 = time.perf_counter()
    _, metrics = run(step, state, args.steps)
    np.asarray(metrics.field_energy)
    print(f"bench: compile+first run {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    _, metrics = run(step, state, args.steps)
    ee = np.asarray(metrics.field_energy)
    elapsed = time.perf_counter() - t0
    pushes_per_sec = n * args.steps / elapsed
    iters = np.asarray(metrics.picard_iters)
    print(f"bench: {elapsed / args.steps * 1e3:.1f} ms/step, picard iters "
          f"mean {iters.mean():.1f}, EE[0]={ee[0]:.3e}", file=sys.stderr)

    if args.drift_steps:
        _, m2 = run(step, state, args.drift_steps)
        tot = np.asarray(m2.field_energy, np.float64) + np.asarray(
            m2.kinetic_energy, np.float64
        )
        print(f"bench: energy drift over {args.drift_steps} steps: "
              f"{(tot[-1] - tot[0]) / tot[0]:.3e}", file=sys.stderr)

    print(json.dumps({
        "metric": "particle_pushes_per_sec_per_chip",
        "value": pushes_per_sec,
        "unit": "pushes/s",
        "vs_baseline": pushes_per_sec / 1e9,
    }))


if __name__ == "__main__":
    main()
