"""Particle source distributions (vectorized RNG samplers).

Rebuilds the reference's infinite Python generators as batch samplers:

* ``sample_source_6d``: volumetric Maxwellian source, gaussian-in-x centered
  mid-domain with sigma L/12, wrapped periodically (pygcpic.py:723-755
  ``source_distribution_6D``). NB the reference adds the drift ``vx`` to all
  three velocity components (pygcpic.py:752) — preserved.
* ``sample_flux_6d``: wall-flux source at the right wall: x in the last cell,
  v_x drawn from the flux-weighted speed distribution |v| g(v; vx, vth) via
  a 100-point discretization + uniform jitter of half a bin, made incoming
  (negative), plus an optional probability-gamma perturbed beam at
  ``vx_pert * vth`` (pygcpic.py:760-778 ``flux_distribution_6D``).

Returned batches are dicts of SI arrays {x, yz, v}; engines mask in however
many they actually consume (re-activation caps, pygcpic.py:2055-2060).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constants import K_BOLTZMANN
from .grid import GridSpec


def sample_source_6d(key, n: int, grid: GridSpec, ti: float, mass: float,
                     vx: float = 0.0, dtype=jnp.float32):
    """Volumetric Maxwellian source batch (pygcpic.py:723-755)."""
    kx, kv = jax.random.split(key)
    length = grid.length
    vth = float(np.sqrt(K_BOLTZMANN * float(ti) / float(mass)))
    x = jax.random.normal(kx, (n,), dtype) * (length / 12.0) + length / 2.0
    x = jnp.mod(x, length)
    v = jax.random.normal(kv, (n, 3), dtype) * vth + vx
    return {"x": x, "yz": jnp.zeros((n, 2), dtype), "v": v}


def sample_flux_6d(key, n: int, grid: GridSpec, ti: float, mass: float,
                   vx: float = 0.0, gamma: float = 0.0, vx_pert: float = 0.0,
                   num_vels: int = 100, dtype=jnp.float32):
    """Wall-flux source batch at the right wall (pygcpic.py:760-778)."""
    kx, kv, kc, kj, kg = jax.random.split(key, 5)
    length = grid.length
    dx = grid.dx
    vth = float(np.sqrt(K_BOLTZMANN * float(ti) / float(mass)))

    x = length - dx * jax.random.uniform(kx, (n,), dtype)
    v = jax.random.normal(kv, (n, 3), dtype) * vth

    # flux-weighted speed distribution on a [-6 vth, 6 vth] grid
    vels = jnp.linspace(-6.0 * vth, 6.0 * vth, num_vels, dtype=dtype)
    dvel = vels[1] - vels[0]
    weights = jnp.exp(-((vels - vx) ** 2) / (2.0 * vth * vth)) * jnp.abs(vels)
    logits = jnp.log(weights + 1e-30)
    idx = jax.random.categorical(kc, logits, shape=(n,))
    jitter = jax.random.uniform(kj, (n,), dtype, -1.0, 1.0) * (dvel / 2.0)
    # jitter applied after the -|.| and before the drift, as the reference
    # does (pygcpic.py:772-773)
    v_x = -jnp.abs(vels[idx]) + jitter + vx
    pert = jax.random.uniform(kg, (n,), dtype) < gamma
    v_x = jnp.where(pert, vx_pert * vth, v_x)
    v = v.at[:, 0].set(v_x)
    return {"x": x, "yz": jnp.zeros((n, 2), dtype), "v": v}


def gaussian_distribution(x, mu, sigma):
    """Normal pdf (pygcpic.py:31-32)."""
    return (
        1.0 / jnp.sqrt(2.0 * jnp.pi * sigma**2)
        * jnp.exp(-((x - mu) ** 2) / (2.0 * sigma**2))
    )


def weighted_gaussian(x, mu, sigma):
    """Flux-weighted normal pdf |x| g(x) (pygcpic.py:757-758)."""
    return gaussian_distribution(x, mu, sigma) * jnp.abs(x)


def sample_to_fill_distribution(key, ideal_distribution, dist_args, lo, hi,
                                num_bins, population, sample_size=1):
    """Deficit-weighted refill sampling (pygcpic.py:19-29): histogram the
    population, sample new values proportional to the positive part of
    (ideal pdf - empirical pdf), with uniform jitter of one bin width.

    Vectorized port of the reference's numpy version; returns
    (sample_size,) draws.
    """
    kc, kj = jax.random.split(key)
    edges = jnp.linspace(lo, hi, num_bins)
    heights, _ = jnp.histogram(jnp.asarray(population), bins=edges,
                               density=True)
    centers = edges[:-1] + (edges[1] - edges[0]) / 2.0
    ideal = ideal_distribution(centers, *dist_args)
    difference = jnp.clip(ideal - heights, 0.0, None)
    logits = jnp.log(difference + 1e-30)
    idx = jax.random.categorical(kc, logits, shape=(sample_size,))
    jitter = jax.random.uniform(kj, (sample_size,), minval=-1.0, maxval=1.0)
    return centers[idx] + jitter * (centers[1] - centers[0])
