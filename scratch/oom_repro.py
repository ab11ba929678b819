"""Reproduce the round-4 BENCH cascade: the exact in-process sequence the
old default mode ran — headline (1e8) then IMMEDIATELY two_stream (1e4)
then domain (1e8), no teardown between rows (BENCH_r04.json: all six
post-headline rows died RESOURCE_EXHAUSTED within seconds).

Usage: python scratch/oom_repro.py [teardown]
  no arg    — round-4 faithful: no teardown between rows
  teardown  — adds del-locals + gc + jax.clear_caches() between rows
              (what scratch/oom_census.py did, minus its 2-min gap)
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
TEARDOWN = len(sys.argv) > 1 and sys.argv[1] == "teardown"

import bench

bench._PICARD_INIT = "extrapolate"
bench._FINALIZE = "converged"
bench._ACCEL = "anderson"
bench._FINALIZE_FIELD = "last"
bench._WINDOW_SHARE = "auto"

args = argparse.Namespace(
    particles=None, steps=10, tol=1e-30, maxiter=4,
    picard_init="extrapolate", finalize="converged",
    picard_accel="anderson", finalize_field="last", window_share="auto",
    migrate_every=1, row_steps=0, sheath_n=0, mag_n=0, mag_exact=False,
    carried=False, drift_steps=0, drift_only=False, drift_budget_s=0.0)

t0 = time.time()
for name, fn in [("headline", bench.bench_headline),
                 ("two_stream", bench.bench_two_stream),
                 ("domain", bench.bench_domain)]:
    try:
        fn(args)
        print(f"[{time.time()-t0:6.1f}s] {name}: OK", flush=True)
    except Exception as e:
        print(f"[{time.time()-t0:6.1f}s] {name}: FAILED {e!r}", flush=True)
    if TEARDOWN:
        import gc

        import jax

        jax.clear_caches()
        gc.collect()
        print(f"[{time.time()-t0:6.1f}s] {name}: teardown done "
              f"(live={sum(a.nbytes for a in jax.live_arrays())/1e9:.2f}G)",
              flush=True)
