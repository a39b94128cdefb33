#!/bin/bash
# Round-5 chip queue, v5 — the entropy-penalty endgame. Written after the
# K=10 ent003 probe CLEARED the sigma window (2.81 @15k vs 3.30 base,
# -0.49 ~ 2.5x sigma) and the K=10 equi-decay lever was refuted by seed
# replication (3.31 vs 3.93). Replaces v3 (shell killed by pidfile; its
# in-flight ent01 probe python survives and is guarded by item 0).
#
# The remaining chip program is a decision TREE, and sessions die on API
# 529s — so the dose decisions are made IN-QUEUE from the recorded jsonl
# readouts rather than by hand:
#   item 1/3: K=10 winning-dose 60k finals, seeds 0 then 1 (the <=3.2
#             question; claim only on the 2-seed mean, >=2x-sigma margin)
#   item 2:   K=30 ent-dose probes (phenotype-matched: ~17/30 lazy)
#   item 4:   temporal ent-dose probes (oracle gap 0.60; ~16/30 lazy)
#   item 5:   K=30 contingent — ent final (seed 0) if a dose cleared 2x
#             sigma (<1.87 vs 2.27 base), ELSE the equi1 seed-1 replicate
#             (third draw of the 1.88+/-0.15 headline)
#   item 6:   temporal contingent — ent final iff cleared (<1.89 vs 2.29)
#   item 7:   temp05/gstd008 replicate re-adjudication (lowest value, last)
#   item 8:   bench inference artifact, only if the orphaned v2 bench did
#             not already land it
set -u
cd /root/repo

LOCK=/tmp/imm_tpu_chip.lock
FINALS=docs/artifacts/final_runs.jsonl
PROBES=docs/artifacts/sweep_tps.jsonl

run() {
  local tries=0
  until "$@"; do
    rc=$?
    tries=$((tries + 1))
    echo "[queue-v5] exit $rc (try $tries) for: $*" >&2
    if [ "$tries" -ge 6 ]; then
      echo "[queue-v5] giving up on: $*" >&2
      return 1
    fi
    sleep 15
  done
}

# Best recorded test %IOD for (variant, steps=15000, seed=0); empty if none.
probe_read() {
  python3 - "$1" <<'PY'
import json, sys
v, best = sys.argv[1], None
try:
    for line in open("docs/artifacts/sweep_tps.jsonl"):
        if not line.strip():
            continue
        r = json.loads(line)
        if (r["variant"] == v and r.get("steps") == 15000
                and r.get("seed", 0) == 0):
            m = r["final"].get("landmark_error_test_pct")
            if isinstance(m, (int, float)) and (best is None or m < best):
                best = m
except FileNotFoundError:
    pass
print("" if best is None else f"{best:.4f}")
PY
}

# 0. Guard: the in-flight K=10 ent01 probe (skip if the orphan finished it,
#    run/resume otherwise). ent003 is already recorded.
run python scripts/sweep_tps.py --only ind_2x_k10_noisefeat_equi2_ent003,ind_2x_k10_noisefeat_equi2_ent01 --seeds 0

# Dose decision for the K=10 finals: ent01 must beat ent003 by >0.1 @15k
# to justify the assertive dose; ties/absences fall back to ent003.
E003=$(probe_read ind_2x_k10_noisefeat_equi2_ent003)
E01=$(probe_read ind_2x_k10_noisefeat_equi2_ent01)
K10_FINAL=final_ind_2x_k10_noisefeat_equi2_ent003_ema_60k
if [ -n "$E01" ] && [ -n "$E003" ] && \
   python3 -c "import sys; sys.exit(0 if $E01 < $E003 - 0.1 else 1)"; then
  K10_FINAL=final_ind_2x_k10_noisefeat_equi2_ent01_ema_60k
fi
echo "[queue-v5] K=10 dose readouts: ent003=$E003 ent01=$E01 -> $K10_FINAL"

# 1. K=10 ent final, seed 0 — the <=3.2 shot.
run python scripts/sweep_tps.py --only "$K10_FINAL" --out "$FINALS" --seeds 0

# 2. K=30 ent-dose probes.
run python scripts/sweep_tps.py --only ind_3x_k30_noisefeat_equi1_ent003,ind_3x_k30_noisefeat_equi1_ent01 --seeds 0

# 3. K=10 ent final, seed 1 — the replicate the claim needs.
run python scripts/sweep_tps.py --only "$K10_FINAL" --out "$FINALS" --seeds 1

# 4. Temporal ent-dose probes.
run python scripts/sweep_tps.py --only temporal_k30_equi1_ent003,temporal_k30_equi1_ent01 --seeds 0

# 5. K=30 contingent: winning-dose ent final if cleared, else the equi1
#    headline seed-1 replicate (third draw).
K303=$(probe_read ind_3x_k30_noisefeat_equi1_ent003)
K301=$(probe_read ind_3x_k30_noisefeat_equi1_ent01)
K30_NEXT=final_ind_3x_k30_noisefeat_equi1_ema_60k; K30_SEEDS=1
if [ -n "$K303" ] || [ -n "$K301" ]; then
  BEST=$(python3 -c "print(min([v for v in [${K303:-999}, ${K301:-999}]]))")
  if python3 -c "import sys; sys.exit(0 if $BEST < 1.87 else 1)"; then
    if python3 -c "import sys; sys.exit(0 if ${K301:-999} < ${K303:-999} else 1)"; then
      K30_NEXT=final_ind_3x_k30_noisefeat_equi1_ent01_ema_60k
    else
      K30_NEXT=final_ind_3x_k30_noisefeat_equi1_ent003_ema_60k
    fi
    K30_SEEDS=0
  fi
fi
echo "[queue-v5] K=30 dose readouts: ent003=$K303 ent01=$K301 -> $K30_NEXT (seed $K30_SEEDS)"
run python scripts/sweep_tps.py --only "$K30_NEXT" --out "$FINALS" --seeds "$K30_SEEDS"

# 6. Temporal contingent: ent final iff a dose cleared (<1.89 vs 2.29 base).
T003=$(probe_read temporal_k30_equi1_ent003)
T01=$(probe_read temporal_k30_equi1_ent01)
if [ -n "$T003" ] || [ -n "$T01" ]; then
  TBEST=$(python3 -c "print(min([v for v in [${T003:-999}, ${T01:-999}]]))")
  if python3 -c "import sys; sys.exit(0 if $TBEST < 1.89 else 1)"; then
    TFIN=final_temporal_k30_equi1_ent003_60k
    if python3 -c "import sys; sys.exit(0 if ${T01:-999} < ${T003:-999} else 1)"; then
      TFIN=final_temporal_k30_equi1_ent01_60k
    fi
    echo "[queue-v5] temporal dose readouts: ent003=$T003 ent01=$T01 -> $TFIN"
    run python scripts/sweep_tps.py --only "$TFIN" --out "$FINALS" --seeds 0
  else
    echo "[queue-v5] temporal ent probes did not clear ($T003 / $T01 vs 1.89) — no temporal final"
  fi
fi

# 7. Replicate re-adjudication of the round-4 sigma-inconclusive probes.
run python scripts/sweep_tps.py --only ind_3x_k30_noisefeat_equi1_temp05,ind_3x_k30_noisefeat_equi1_gstd008 --seeds 1,2

# 8. Serving benchmark artifact, only if the v2 orphan didn't land it.
if [ ! -s docs/artifacts/bench_inference.json ]; then
  run flock "$LOCK" bash -c 'python bench.py --mode inference > /tmp/bench_inference.json && cp /tmp/bench_inference.json docs/artifacts/bench_inference.json'
fi

echo "[queue-v5] complete"
