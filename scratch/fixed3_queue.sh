#!/bin/bash
# Fixed-3 conserving-candidate drift protocol (restarted after the session
# cut at 10:18). If fixed-3 + extrapolate + Anderson holds <1e-3/1e4 drift,
# the conserving headline moves 2.11e9 -> ~2.6e9.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
{
date
timeout 300 python -c "import jax; print(jax.devices())" || exit 1
# 1. fixed-3 + anderson (the candidate)
timeout 3600 python bench.py --only headline --maxiter 3 --drift-steps 10000
# 2. fixed-3 unmixed (is Anderson load-bearing for drift at 3?)
timeout 3600 python bench.py --only headline --maxiter 3 --picard-accel none --drift-steps 10000
date
} 2>&1 | tee -a scratch/fixed3_drift.log
