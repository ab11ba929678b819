#!/bin/bash
# Sequential carried-rho drift A/B queue (single-CPU box): 4 runs of
# scratch/drift_carried_rho_cpu.py, logs to scratch/drift_cr_<mode>_<seed>.log.
cd /root/repo
for run in "composed 42" "carried 42" "composed 7" "carried 7"; do
  set -- $run
  timeout 5400 python scratch/drift_carried_rho_cpu.py "$1" "$2" \
    > "scratch/drift_cr_${1}_${2}.log" 2>&1
done
echo "ALL DRIFT RUNS DONE $(date)" >> scratch/drift_cr_queue.done
