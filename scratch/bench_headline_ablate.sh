#!/bin/bash
# Headline step ablation at 1e8 (v5e): pin where the conserving config's
# ~8 ms/step over the tol-1e-9 throughput config goes (anderson mixing?
# fixed-count while_loop? finalize?). Each row is an independent bench
# invocation (same shapes -> warm XLA cache after the first).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
{
date
# 1. conserving default (fixed-4 + extrapolate + anderson + converged)
timeout 1800 python bench.py --only headline
# 2. - anderson
timeout 1800 python bench.py --only headline --picard-accel none
# 3. old throughput config (tol 1e-9, cap 50, no mixing)
timeout 1800 python bench.py --only headline --throughput
# 4. conserving but reference last-iterate finalize
timeout 1800 python bench.py --only headline --finalize iterate
# 5. conserving w/o mixing AND last-iterate finalize (floor)
timeout 1800 python bench.py --only headline --picard-accel none --finalize iterate
date
} 2>&1 | tee -a scratch/headline_ablate.log
