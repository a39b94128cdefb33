#!/bin/bash
# Round-5 chip queue, v2 — re-prioritized after the first three readouts
# (K=10 equi2sched s0 = 3.31/3.29-EMA new best; sep1m005 refuted at 4.54;
# K=30 equisched s0 in flight when v1 was retired). Order now tracks
# VERDICT r4's ranking directly:
#   #1  K=10 seed-1 replicate (the <=3.2 claim needs a 2-seed mean)
#   #4  temporal supervised oracle (the 2.01 headline has no ceiling)
#   #5  serving benchmark artifact
#   #3  K=30 ent-dose probes + seed-1 replicate
#   #2  replicate re-adjudication of the two sigma-inconclusive probes
# Item 0 re-issues the v1 in-flight K=30 final: the (variant,steps,seed)
# skip-set makes it a no-op if the orphaned v1 python finished it, and an
# Orbax resume if that python died — so v1's retry protection is preserved.
# Every run blocks on /tmp/imm_tpu_chip.lock (sweep_tps takes it internally;
# one-offs are wrapped in flock) so nothing time-slices the single chip.
set -u
cd /root/repo

LOCK=/tmp/imm_tpu_chip.lock
FINALS=docs/artifacts/final_runs.jsonl

run() {
  local tries=0
  until "$@"; do
    rc=$?
    tries=$((tries + 1))
    echo "[queue-v2] exit $rc (try $tries) for: $*" >&2
    if [ "$tries" -ge 6 ]; then
      echo "[queue-v2] giving up on: $*" >&2
      return 1
    fi
    sleep 15
  done
}

# 0. Guard/laggard: the v1 in-flight K=30 equi-decay final (skip or resume).
run python scripts/sweep_tps.py --only final_ind_3x_k30_noisefeat_equisched_ema_60k --out "$FINALS" --seeds 0

# 1. K=10 equi2sched seed-1 replicate — the <=3.2 question's 2-seed mean.
run python scripts/sweep_tps.py --only final_ind_2x_k10_noisefeat_equi2sched_ema_60k --out "$FINALS" --seeds 1

# 2. Temporal supervised oracle (VERDICT r4 #4): ceiling for the 2.01
#    headline, on the temporal recipe's exact image stream.
run flock "$LOCK" python scripts/oracle_floor.py --temporal --k 30

# 3. Serving benchmark artifact (VERDICT r4 #5): exported landmark detector
#    + swap generator on the real chip, recorded to docs/artifacts/.
run flock "$LOCK" bash -c 'python bench.py --mode inference > /tmp/bench_inference.json && cp /tmp/bench_inference.json docs/artifacts/bench_inference.json && cat docs/artifacts/bench_inference.json'

# 4. K=30 entropy-dose probes (concentration lever from the diagnosis).
run python scripts/sweep_tps.py --only ind_3x_k30_noisefeat_equi1_ent003,ind_3x_k30_noisefeat_equi1_ent01 --seeds 0

# 5. K=30 equi-decay final seed-1 replicate (headline becomes a mean±sd).
run python scripts/sweep_tps.py --only final_ind_3x_k30_noisefeat_equisched_ema_60k --out "$FINALS" --seeds 1

# 6. Replicate re-adjudication of the sigma-inconclusive concentration
#    probes (seed 0 recorded round 4).
run python scripts/sweep_tps.py --only ind_3x_k30_noisefeat_equi1_temp05,ind_3x_k30_noisefeat_equi1_gstd008 --seeds 1,2

echo "[queue-v2] complete"
