#!/bin/bash
# Round-5 chip queue (VERDICT r4 next #1/#2/#3): the registered-but-unrun
# convergence program, run with seed replicates, in priority order —
# primary seed-0 readings of both finals first, probes next, replicate
# seeds last, so an early wall-clock death still leaves the most decisive
# numbers recorded. Each invocation resumes from Orbax checkpoints via the
# runner's (variant, steps, seed)-keyed skip set; the retry loop absorbs
# stall-watchdog exits (42) and device-init watchdog exits (86).
set -u
cd /root/repo

run() {
  local tries=0
  until python scripts/sweep_tps.py "$@"; do
    rc=$?
    tries=$((tries + 1))
    echo "[queue] exit $rc (try $tries) for: $*" >&2
    if [ "$tries" -ge 6 ]; then
      echo "[queue] giving up on: $*" >&2
      return 1
    fi
    sleep 15
  done
}

FINALS=docs/artifacts/final_runs.jsonl

# 1. K=10 equi-decay convergence candidate (sweep_variants.yaml:496) — the
#    open <=3.2 question's registered lever. Primary seed first.
run --only final_ind_2x_k10_noisefeat_equi2sched_ema_60k --out "$FINALS" --seeds 0
# 2. The margin-0.05 separation probe (diagnosis-scale hinge).
run --only ind_2x_k10_noisefeat_equi2_sep1m005 --seeds 0
# 3. K=30 equi-decay final against the 1.37 oracle.
run --only final_ind_3x_k30_noisefeat_equisched_ema_60k --out "$FINALS" --seeds 0
# 4. K=30 entropy-dose probes (concentration lever from the diagnosis).
run --only ind_3x_k30_noisefeat_equi1_ent003,ind_3x_k30_noisefeat_equi1_ent01 --seeds 0
# 5. Replicate seeds of both finals (any 3.2-crossing claim needs a 2-seed
#    mean or >=2-sigma margin; K=30 headline becomes a distribution).
run --only final_ind_2x_k10_noisefeat_equi2sched_ema_60k --out "$FINALS" --seeds 1
run --only final_ind_3x_k30_noisefeat_equisched_ema_60k --out "$FINALS" --seeds 1
# 6. Re-adjudicate the two sigma-inconclusive concentration probes with
#    replicates (seed 0 already recorded round 4).
run --only ind_3x_k30_noisefeat_equi1_temp05,ind_3x_k30_noisefeat_equi1_gstd008 --seeds 1,2

echo "[queue] round-5 queue complete"
