"""Magnetized sheath with surface coupling: H plasma against a boron wall,
sputtering/reflection via the empirical surface model (swap in FTridynBCA
when the external package is available).

Usage: python examples/sheath_bca.py [steps]
"""

import dataclasses
import sys

import numpy as np

from pypic_tpu import bca, presets
from pypic_tpu.engines import bca_driver, magnetized


def main(steps=150):
    # the preset is BCA-ready: capped-source re-activation, capacity
    # headroom, wall-impact extraction, mid-domain escape removal
    pre = presets.pic_bca_aps(ppc=20)
    cfg = pre.config
    state = pre.state
    model_sw = bca.BinaryCollisionModel(seed=1)  # H -> B wall
    model_ww = bca.BinaryCollisionModel(incident_m_amu=10.81, incident_z=5,
                                        seed=2)  # B self-sputtering
    fin, stats, _ = bca_driver.run_bca(
        state, cfg, steps, model_sw, model_ww,
        product_p2c=float(np.asarray(state.p2c)[0]), seed=3,
    )
    print(f"incident: {stats.source_incident} H, {stats.wall_incident} B")
    print(f"total yield: {stats.total_yield():.4f}  "
          f"H reflection: {stats.source_reflection():.4f}")
    act = np.asarray(fin.active) == 1
    boron = (np.asarray(fin.species_idx)[act] == 1).sum()
    print(f"boron alive in plasma: {boron} "
          f"(injected {stats.injected}, dropped {stats.dropped})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 150)
