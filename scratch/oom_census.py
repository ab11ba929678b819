"""Root-cause the round-4 BENCH cascade: headline (1e8) ran, then EVERY
other row — including two_stream at 1e4 — died RESOURCE_EXHAUSTED.

Reproduces the exact in-process sequence and censuses device memory
(device.memory_stats) + client-visible arrays (jax.live_arrays) at each
stage, then tests which teardown actually returns HBM:
  stage 0: baseline
  stage 1: after headline row (state + 10 steps, metrics fetched)
  stage 2: after dropping all Python references + gc
  stage 3: after jax.clear_caches()
  stage 4: attempt the domain row (the first round-4 casualty)
Run:  timeout 1200 python scratch/oom_census.py
"""
import gc
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

t0 = time.time()
dev = jax.devices()[0]
print(f"backend={jax.default_backend()} dev={dev}", flush=True)


def census(tag):
    arrs = jax.live_arrays()
    tot = sum(a.nbytes for a in arrs)
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception as e:
        stats = {"err": repr(e)}
    biu = stats.get("bytes_in_use", stats.get("err", "?"))
    lim = stats.get("bytes_limit", "?")
    peak = stats.get("peak_bytes_in_use", "?")
    def g(x):
        return f"{x/1e9:.2f}G" if isinstance(x, (int, float)) else x
    print(f"[{time.time()-t0:6.1f}s] {tag}: client {len(arrs)} arrs "
          f"{tot/1e9:.2f}G | device in_use={g(biu)} peak={g(peak)} "
          f"limit={g(lim)}", flush=True)


census("baseline")

# ---- stage 1: the headline row, exactly as bench.py runs it ----
import bench
from pypic_tpu.constants import E_CHARGE, M_ELECTRON
from pypic_tpu.engines import implicit
from pypic_tpu.runner import run

n = 6104 * 16384
grid, x, v, cfg = bench._landau_problem(n, 1e-30, maxiter=4)
state = implicit.init_state(x, v, -E_CHARGE, M_ELECTRON, cfg)
census("after init_state(1e8)")
step = implicit.make_step(cfg)
_, m = run(step, state, 10)
np.asarray(m.field_energy)
census("after 10 headline steps")

# ---- stage 2: drop refs ----
del x, v, state, m, step
gc.collect()
census("after del + gc")

# ---- stage 3: clear compiled-executable caches ----
jax.clear_caches()
gc.collect()
census("after jax.clear_caches()")
time.sleep(5)
census("after 5s settle")

# ---- stage 4: the first round-4 casualty: the domain row at 1e8 ----
try:
    from pypic_tpu.parallel import domain_implicit as di, make_mesh

    grid2, x2, v2, _ = bench._landau_problem(n, 1e-30)
    sigma_cells = float(np.asarray(v2).std()) * 1e-5 / grid2.dx
    halo = min(grid2.ng - 3, max(4, int(np.ceil(8.0 * sigma_cells))))
    dcfg = di.DomainImplicitConfig(
        grid2, 1e-5, grid2.length * 1e5 / n, num_shards=1,
        tol=1e-30, maxiter=4, halo=halo,
        picard_init="extrapolate", finalize="converged",
        picard_accel="anderson",
        migrate_cap=max(4096, 4 * (n // grid2.ng)))
    mesh = make_mesh(1, axis="slabs")
    st = di.shard_state(
        di.init_state(x2, v2, -E_CHARGE, M_ELECTRON, dcfg,
                      capacity_factor=1.05), mesh, dcfg)
    census("after domain init_state(1e8)")
    dstep = di.make_step(dcfg, mesh)
    _, dm = run(dstep, st, 10)
    np.asarray(dm.field_energy)
    census("after 10 domain steps")
    print("RESULT: domain row SURVIVED after teardown", flush=True)
except Exception as e:
    census("domain row FAILED")
    print(f"RESULT: domain row FAILED: {e!r}", flush=True)
