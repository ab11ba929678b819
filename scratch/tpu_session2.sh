#!/bin/bash
# Round-3 continuation queue (tunnel back up 2026-08-19). Items the first
# queue run missed: the pallas-Newton rows (fixed: Mosaic scalar-store),
# the interrupted domain drift, migrate-every/domain_explicit A/Bs.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
{
date
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

# 1. the rows that failed on the scalar-store bug
timeout 2400 python bench.py --only sheath
timeout 2400 python bench.py --only magnetized
timeout 2400 python scratch/bench_mag_round3b.py

# 2. north-star drift for configs[4] (interrupted at chunk 1 last run)
timeout 3600 python bench.py --only domain --drift-steps 10000

# 3. superstep + explicit-domain A/Bs
timeout 2400 python bench.py --only domain --migrate-every 4
timeout 2400 python bench.py --only domain_explicit
timeout 2400 python bench.py --only domain_explicit --migrate-every 4
timeout 2400 python bench.py --only domain_explicit --carried
date
} 2>&1 | tee -a scratch/tpu_session2.log
