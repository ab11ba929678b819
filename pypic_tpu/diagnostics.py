"""Diagnostics: time-series analysis, histograms, and text dumps.

Rebuilds the reference's L8 analysis pieces as offline post-processing over
the metric arrays the jitted engines return (no matplotlib in the hot loop,
SURVEY.md §5):

* ``first_peak_index``: Landau first-peak detection on the field-energy
  series via its time derivative sign change (pypic.py:599-611).
* ``growth_rate_from_energy``: exponential growth/damping-rate fit of the
  E^2 series — the quantitative replacement for the reference's eyeballed
  analytic-rate overlays (pypic.py:598-614).
* ``damping_rate_from_peaks``: peak-envelope fit for oscillating decay.
* ``phase_space_histogram`` / ``velocity_histogram``: the summary-plot
  reductions (pypic.py:583, 592) as device-side histograms.
* ``write_run_outputs``: the end-of-run text dumps — plots/E2.txt, plots/J.txt
  and parameters.out (pypic.py:637-648).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp


def first_peak_index(energy, dt: float) -> int:
    """Index of the first local maximum of a time series (pypic.py:599-611:
    sign change of the centered time derivative with positive left slope)."""
    e = np.asarray(energy, np.float64)
    de = np.gradient(e, dt)
    prod = de[1:] * de[:-1]
    for s in range(len(prod)):
        if prod[s] < 0.0 and de[s] > 0.0:
            return s + 1
    return 0


def growth_rate_from_energy(energy, dt: float, saturation_frac: float = 0.5):
    """Growth rate gamma with E^2 ~ exp(2 gamma t): from the pre-growth
    minimum to the half-saturation crossing."""
    e = np.asarray(energy, np.float64)
    i1 = int(np.argmax(e > saturation_frac * e.max()))
    i0 = int(np.argmin(e[:max(i1, 2)]))
    if i1 - i0 < 2:
        raise ValueError(f"no growth window found: [{i0}, {i1}]")
    return np.log(e[i1] / e[i0]) / (2.0 * (i1 - i0) * dt)


def damping_rate_from_peaks(energy, dt: float, t_max: float | None = None,
                            floor_mult: float = 5.0):
    """Damping rate from the peak envelope of an oscillating E^2 decay
    (E^2 oscillates at 2 w_pe during Landau damping)."""
    e = np.asarray(energy, np.float64)
    floor = e.min() * floor_mult
    peaks = [
        i for i in range(2, len(e) - 2)
        if e[i] > e[i - 1] and e[i] >= e[i + 1] and e[i] > floor
    ]
    t = np.arange(len(e)) * dt
    if t_max is not None:
        peaks = [i for i in peaks if t[i] < t_max]
    if len(peaks) < 3:
        raise ValueError(f"only {len(peaks)} envelope peaks found")
    return np.polyfit(t[peaks], np.log(e[peaks]), 1)[0] / 2.0


def phase_space_histogram(p, v, ng_x: int, nv: int, x_range, v_range):
    """2D (x, v) histogram — the reference's hist2d panel (pypic.py:583)."""
    h, xe, ve = jnp.histogram2d(
        jnp.asarray(p), jnp.asarray(v), bins=(ng_x, nv),
        range=[list(x_range), list(v_range)],
    )
    return h, xe, ve


def velocity_histogram(v, bins: int, v_range):
    h, edges = jnp.histogram(jnp.asarray(v), bins=bins, range=v_range)
    return h, edges


def write_run_outputs(directory: str, energy, current, params: dict):
    """End-of-run text dumps (pypic.py:637-648): E2.txt, J.txt,
    parameters.out."""
    os.makedirs(directory, exist_ok=True)
    np.savetxt(os.path.join(directory, "E2.txt"), np.asarray(energy))
    np.savetxt(os.path.join(directory, "J.txt"), np.asarray(current))
    with open(os.path.join(directory, "parameters.out"), "w") as f:
        for key, value in params.items():
            print(key, value, file=f)
