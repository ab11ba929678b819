"""Component budget of the magnetized pic_iead step at 1e6 (v5e).

Times step variants with features disabled to attribute costs:
full, no-IEAD, no-ionization, no-impact-buffer, no-reactivation.
"""
import sys
import time

import dataclasses as dc

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

from pypic_tpu.presets import pic_iead
from pypic_tpu.runner import run

STEPS = 100
pre = pic_iead(n_per_species=1_000_000 // 6)
n = pre.state.p.shape[0]

variants = {
    "full": {},
    "no-iead": dict(iead_energy_max=0.0),
    "no-ionization": dict(ionization=False),
    "no-impacts": dict(impact_buffer_size=0),
    "no-reactivation": dict(reactivate="none"),
    "newton-1iter": dict(newton_maxiter=1),
    # round-3: murmur3 hashing is expensive on the VPU (no native u32
    # multiply) — compare the threefry re-activation batch sampler
    "threefry-sampler": dict(source_sampler="threefry"),
}

for name, kw in variants.items():
    try:
        cfg = dc.replace(pre.config, **kw)
    except (TypeError, ValueError) as e:
        print(f"{name}: skipped ({e})", flush=True)
        continue
    from pypic_tpu.engines import magnetized

    step = magnetized.make_step(cfg)

    def go():
        _, m = run(step, pre.state, STEPS)
        np.asarray(m.phi_max)

    go()
    t0 = time.perf_counter()
    go()
    el = time.perf_counter() - t0
    print(f"{name}: {el / STEPS * 1e3:.2f} ms/step", flush=True)
