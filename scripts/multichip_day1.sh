#!/bin/bash
# Multichip day-1 measurement pack.
#
# This build was developed against ONE real TPU v5e chip: every multi-chip
# path (slab domain decomposition, supersteps, carried single-sweep cycles,
# the distributed tridiagonal solve, data-parallel psums) is equivalence-
# tested on an 8-device virtual CPU mesh and dry-run-compiled by
# __graft_entry__.dryrun_multichip, but none has a multi-chip WALL-CLOCK
# measurement. SCALING.md builds the predictive model (collective census +
# single-chip times). The day a multi-device host appears, run THIS script
# first: each row is one A/B the model makes a falsifiable prediction for,
# so the first session validates (or corrects) SCALING.md instead of
# rediscovering the queue from scratch.
#
# Usage:
#   scripts/multichip_day1.sh          # real hardware (all visible chips)
#   scripts/multichip_day1.sh --dry    # 8-device virtual CPU mesh smoke:
#                                      # same code paths, tiny sizes, no
#                                      # timing meaning — proves the queue
#                                      # itself runs end-to-end
#
# Every row appends to scratch/multichip_day1.log and emits the standard
# bench JSON line (one per row) on stdout. bench.py rows size their mesh
# from len(jax.devices()) — nothing here is chip-count-specific.

set -uo pipefail
cd "$(dirname "$0")/.."
LOG=scratch/multichip_day1.log
: >"$LOG"

DRY=""
SIZES=""
if [[ "${1:-}" == "--dry" ]]; then
  # bench --cpu forces the CPU backend in-process; the env var below gives
  # it 8 virtual devices so the sharded paths run 8-way (tests/conftest.py
  # pattern). Sizes shrink to smoke scale.
  export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
  DRY="--cpu"
  SIZES="--particles 65536 --row-steps 4"
fi

run() {
  local label="$1"; shift
  echo "=== $label" | tee -a "$LOG" >&2
  echo "    predicted: $1" | tee -a "$LOG" >&2; shift
  timeout 3000 python bench.py "$@" $DRY $SIZES 2>>"$LOG"
  echo "rc=$? ($label)" >>"$LOG"
}

D=$(timeout 600 python -c "
import jax
if '$DRY':
    jax.config.update('jax_platforms', 'cpu')  # match bench --cpu
print(len(jax.devices()))" 2>>"$LOG")
echo "=== devices: D=$D" | tee -a "$LOG" >&2

# 1. Single-chip control: anchors the per-shard compute term of every
#    prediction below against THIS host's chips (PERF.md numbers are from
#    the round-3/4 v5e; re-anchor before judging scaling ratios).
run "headline (single-chip-equivalent control)" \
    "47-48 ms/step per 1e8 at v5e-class chips (2.1e9 pushes/s; PERF.md)" \
    --only headline

# 2. Flagship domain-decomposed implicit across all D chips.
#    SCALING.md time model: t(D) = 47.9/D + ~0.1 (collective latency,
#    flat in D) + ~0.1 (migration at 45 GB/s) ms/step -> at D=8: ~6.2 ms,
#    ~7.7x strong scaling (1.6e10 pushes/s).
run "domain implicit, per-step migration" \
    "47.9/D + 0.2 ms/step (D=8: ~6.2 ms, ~7.7x)" \
    --only domain

# 3. Superstep A/B: amortizes wrap+migration over k=4 micro-steps. At D=1
#    this measured SLOWER (k-wide halo widens every ext sweep with nothing
#    to amortize — PERF.md round-3d); the model says it wins once the
#    migration term is real (D >= 4).
run "domain implicit, superstep k=4" \
    "divides the ~0.1 ms migration term by 4; wins for D>=4, loses at D=1" \
    --only domain --migrate-every 4

# 4. Sharded drift gate: the two-clause north star on the MULTI-chip
#    flagship (the drift number must survive sharding, not just speed).
run "domain implicit, 1e4-step drift" \
    "same band as single-chip: ~-4e-4/1e4 (conserving fixed-4)" \
    --only domain --drift-steps 10000

# 5. Explicit domain cycle across D chips.
#    Single-chip: 16.2 ms/step at 1e8 (6.2e9 pushes/s). Same model shape:
#    t(D) ~ 16.2/D + 0.1 + migration.
run "domain explicit, replicated solve" \
    "16.2/D + ~0.2 ms/step" \
    --only domain_explicit

# 6. Carried-rho one-sweep A/B (deposit rides the push kernel): saved no
#    time at D=1 (PERF.md round-3g table: the 1-shard row already
#    short-circuits migration); the lead exists for the sharded regime
#    where the second sweep's halo traffic is real.
run "domain explicit, carried-rho one-sweep" \
    "<= replicated-solve row; the A/B margin IS the measurement" \
    --only domain_explicit --carried

# 7. Distributed tridiagonal solve A/B: at the bench ng=200 the replicated
#    solve is one 800 B all_gather — the distributed substructuring only
#    pays off at ng >> 1e4 (SCALING.md). Run BOTH to confirm the crossover
#    direction; for a large-ng point, rerun with e.g.
#    PYPIC_BENCH_NG... (edit _landau_problem's ng) or use the CLI preset
#    domain_explicit with --opt field_solve=distributed.
run "domain explicit, distributed tridiag solve" \
    "~= replicated at ng=200 (collective swap: all_gather -> ppermute chain)" \
    --only domain_explicit --field-solve distributed

echo "=== done — log: $LOG" >&2
