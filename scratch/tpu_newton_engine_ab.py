"""Engine-level Newton-backend A/B on the real chip: 50 steps of the
bench pic_iead workload with newton_backend='xla' vs 'pallas', comparing
the phi trajectory and step metrics. The two inner solves (pscan-Thomas
vs PCR) round differently in f32, so trajectories decorrelate through the
chaotic dynamics — the check is that both stay physical and close over a
short horizon, not bit-equality (single-solve equivalence is tested in
tests/test_ops.py on identical inputs).
"""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses as dc

import numpy as np
import jax

from pypic_tpu.presets import pic_iead
from pypic_tpu.engines import magnetized
from pypic_tpu.runner import run

print(f"backend={jax.default_backend()}", flush=True)
pre = pic_iead(n_per_species=100_000 // 6)
out = {}
for backend in ("xla", "pallas"):
    cfg = dc.replace(pre.config, newton_backend=backend)
    _, m = run(magnetized.make_step(cfg), pre.state, 50)
    out[backend] = dict(
        phi_max=np.asarray(m.phi_max, np.float64),
        iters=np.asarray(m.newton_iters, np.float64),
        res=np.asarray(m.newton_residual, np.float64),
    )
    print(f"{backend}: phi_max[-1]={out[backend]['phi_max'][-1]:.4f} "
          f"iters mean {out[backend]['iters'].mean():.2f} "
          f"residual max {out[backend]['res'].max():.3e}", flush=True)

a, b = out["xla"], out["pallas"]
# early steps (pre-decorrelation) should agree tightly; later within the
# stochastic band of the workload
head = slice(0, 10)
rel_head = np.max(np.abs(a["phi_max"][head] - b["phi_max"][head])
                  / np.maximum(np.abs(a["phi_max"][head]), 1e-3))
rel_tail = abs(a["phi_max"][-1] - b["phi_max"][-1]) / abs(a["phi_max"][-1])
ok = rel_head < 5e-3 and rel_tail < 0.2
print(f"{'PASS' if ok else 'FAIL'}: head rel diff {rel_head:.2e} (<5e-3), "
      f"tail rel diff {rel_tail:.2e} (<0.2)", flush=True)
sys.exit(0 if ok else 1)
