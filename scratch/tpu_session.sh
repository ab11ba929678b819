#!/bin/bash
# TPU measurement queue — round-4 state: ALL round-3 pending measurements
# ran (logs: tpu_session*.log, bench_all_r3i.log) and every lead closed;
# round 4 re-validated the full matrix (PERF.md round-4 table; magnetized
# 0.74 ms / domain_explicit 6.10e9 uncontended). Nothing is queued.
#
# If the tunnel has been down and you need a fresh full-matrix artifact:
set -x
cd /root/repo
timeout 300 python -c "import jax; print(jax.devices())" || exit 1
timeout 3000 python bench.py --budget-s 1500 2>scratch/tpu_session.log
