#!/bin/bash
# Round-3 pending TPU measurements, priority-ordered so a flaky tunnel
# window still captures the most important numbers first. Run from
# /root/repo; logs to scratch/tpu_session.log.
set -x
cd /root/repo
LOG=scratch/tpu_session.log
{
date
# 0. device sanity
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

# 1. THE HEADLINE FIRST (conserving config; window_share='auto' measures
#    BOTH pass layouts in-run) — if the tunnel only stays up briefly, this
#    is the number that matters most
timeout 3600 python bench.py

# 2. magnetized fast-path A/B (validates the in-kernel while_loop compiles:
#    pallas Newton, react_batch, iead_pack) — the 1e9-at-1e6 target
timeout 2400 python scratch/bench_mag_round3b.py

# 2b. shared-window Picard pass standalone A/B (per-pass breakdown detail)
timeout 2400 python scratch/bench_window_share.py

# 3. resident small-n rows
timeout 1800 python bench.py --only two_stream
timeout 1800 python bench.py --only landau

# 4. the rest of the matrix
timeout 2400 python bench.py --only sheath
timeout 2400 python bench.py --only sheath --mag-exact
timeout 2400 python bench.py --only magnetized
# 4b. carried-deposit A/B on the magnetized row (round 3c; exactness
#     metrics asserted in-bench — watch for the WARNING line)
timeout 2400 python bench.py --only magnetized --carried
timeout 3600 python bench.py --only domain
# 4c. north-star drift for configs[4] (VERDICT item 7: the domain-
#     decomposed flagship's 1e4-step energy drift is otherwise unmeasured)
timeout 3600 python bench.py --only domain --drift-steps 10000
# 5. migration-amortized superstep A/B (single chip: measures the d_tot==1
#    migrate skip already; --migrate-every exercises the superstep path so
#    its TPU compile + per-step cost are on record for multi-chip)
timeout 2400 python bench.py --only domain --migrate-every 4
# 6. explicit domain path at 1e8 (new row; per-step [auto-fused push] vs
#    k=4 superstep vs carried-rho one-sweep cycle)
timeout 2400 python bench.py --only domain_explicit
timeout 2400 python bench.py --only domain_explicit --migrate-every 4
timeout 2400 python bench.py --only domain_explicit --carried
date
} 2>&1 | tee -a "$LOG"
