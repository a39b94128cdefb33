#!/bin/bash
# Round-5 chip queue, v3 — re-prioritized after the K=30 equi-decay readout
# (1.996/1.986 EMA = the 1.88±0.15 distribution's center: the K=10 lever
# does NOT transfer to K=30, so its seed-1 replicate is cut). Changes vs v2:
#   * K=10 ent-dose probes inserted right after the seed-1 guard — the
#     equi2sched decomposition found 2/10 landmarks idle with the K=30
#     lazy-landmark phenotype, and the entropy penalty is the matched
#     lever for the ≤3.2 question (VERDICT r4 #1).
#   * v2 item 5 (K=30 equisched seed-1) replaced by a seed-1 replicate of
#     the HEADLINE recipe final_ind_3x_k30_noisefeat_equi1_ema_60k — a
#     third draw sharpens the 1.88±0.15 distribution; replicating the
#     neutral schedule variant would not.
# Item 0 re-issues the orphaned v2 in-flight run (K=10 equi2sched seed 1):
# skip if its python finished, Orbax-resume if it died. Contingent 60k
# finals (K=10 equi2sched+ent / K=30 equi1+ent) are launched by hand once
# the probes read out — they are registered only if a dose clears the
# sigma window.
set -u
cd /root/repo

LOCK=/tmp/imm_tpu_chip.lock
FINALS=docs/artifacts/final_runs.jsonl

run() {
  local tries=0
  until "$@"; do
    rc=$?
    tries=$((tries + 1))
    echo "[queue-v3] exit $rc (try $tries) for: $*" >&2
    if [ "$tries" -ge 6 ]; then
      echo "[queue-v3] giving up on: $*" >&2
      return 1
    fi
    sleep 15
  done
}

# 0. Guard/laggard: the v2 in-flight K=10 seed-1 replicate (skip or resume).
run python scripts/sweep_tps.py --only final_ind_2x_k10_noisefeat_equi2sched_ema_60k --out "$FINALS" --seeds 1

# 1. K=10 entropy-dose probes (the ≤3.2 question's phenotype-matched lever).
run python scripts/sweep_tps.py --only ind_2x_k10_noisefeat_equi2_ent003,ind_2x_k10_noisefeat_equi2_ent01 --seeds 0

# 2. Temporal supervised oracle (VERDICT r4 #4): ceiling for the 2.01
#    headline, on the temporal recipe's exact image stream.
run flock "$LOCK" python scripts/oracle_floor.py --temporal --k 30

# 3. Serving benchmark artifact (VERDICT r4 #5).
run flock "$LOCK" bash -c 'python bench.py --mode inference > /tmp/bench_inference.json && cp /tmp/bench_inference.json docs/artifacts/bench_inference.json && cat docs/artifacts/bench_inference.json'

# 4. K=30 entropy-dose probes (concentration lever from the K=30 diagnosis).
run python scripts/sweep_tps.py --only ind_3x_k30_noisefeat_equi1_ent003,ind_3x_k30_noisefeat_equi1_ent01 --seeds 0

# 5. K=30 HEADLINE recipe seed-1 replicate (third draw of 1.77/1.98).
run python scripts/sweep_tps.py --only final_ind_3x_k30_noisefeat_equi1_ema_60k --out "$FINALS" --seeds 1

# 6. Replicate re-adjudication of the sigma-inconclusive concentration
#    probes (seed 0 recorded round 4).
run python scripts/sweep_tps.py --only ind_3x_k30_noisefeat_equi1_temp05,ind_3x_k30_noisefeat_equi1_gstd008 --seeds 1,2

echo "[queue-v3] complete"
