"""A/B the round-3b magnetized fast paths on the bench pic_iead workload
(1e6 particles, ng=600, v5e): newton_backend xla vs pallas (one-kernel PCR
Newton), react_batch 0 vs 16384 (rank-keyed capped draw), iead_pack 0 vs
16384 (packed histogram). Amortizes 400 steps per dispatch like bench.py."""
import sys, time, itertools
sys.path.insert(0, "/root/repo")
import numpy as np, jax
import dataclasses as dc
from pypic_tpu.presets import pic_iead
from pypic_tpu.engines import magnetized
from pypic_tpu.runner import run

STEPS = 400
pre = pic_iead(n_per_species=1_000_000 // 6)
n = pre.state.p.shape[0]
print(f"backend={jax.default_backend()} n={n}", flush=True)

variants = [
    ("baseline (r3 bench)", dict(newton_backend="xla")),
    ("+pallas newton", dict(newton_backend="pallas")),
    ("+react_batch", dict(newton_backend="pallas", react_batch=16384)),
    ("+iead_pack (full fast)", dict(newton_backend="pallas",
                                    react_batch=16384, iead_pack=16384)),
    ("fast w/ xla newton", dict(newton_backend="xla", react_batch=16384,
                                iead_pack=16384)),
]
for name, kw in variants:
    cfg = dc.replace(pre.config, **kw)
    step = magnetized.make_step(cfg)

    def go():
        _, m = run(step, pre.state, STEPS)
        np.asarray(m.phi_max)
        return m

    m = go()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        m = go()
        best = min(best, time.perf_counter() - t0)
    ms = best / STEPS * 1e3
    it = np.asarray(m.newton_iters).mean()
    drop = int(np.asarray(m.iead_dropped).sum()) if kw.get("iead_pack") else 0
    print(f"{name}: {ms:.3f} ms/step -> {n / ms * 1e3:.3e} pushes/s "
          f"(newton {it:.1f} iters, dropped {drop})", flush=True)
