#!/usr/bin/env bash
# Round-4 hardware evidence matrix, serialized on the one real TPU chip.
# Each leg merges into its artifact incrementally, so partial progress is
# never lost; legs are ordered by verdict-item leverage (VERDICT.md r3):
#   1. singletask_ft baselines   -> relative_gain becomes computable
#   2. sequential_ft + ER        -> refresh the r03 headline runs at the
#                                   learnable r04 config
#   3. ewc + freeze_bottom_k     -> first-ever full driver stack on hardware
#   4. viltbert (2-task)         -> first hardware ViLT-BERT sequence, with
#                                   its own singletask baselines so its
#                                   gains are non-null too
#   5. adapter                   -> completes the r04 algorithm matrix
#   6. transfer refresh          -> pure results.json math, fills gains
#   7. accum sweep vs auto       -> ACCUM_SWEEP_r04.json (verdict item 4)
#   8. long-seq language A/B     -> LONGSEQ_r04.json (verdict item 5)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r04_hw
mkdir -p "$LOG"
run() { # run <name> <cmd...>
  local name=$1; shift
  echo "[$(date +%T)] START $name" | tee -a "$LOG/progress.log"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "[$(date +%T)] DONE  $name rc=$rc" | tee -a "$LOG/progress.log"
  return $rc
}

run singletask   python exp_scripts/run_cl_smoke_tpu.py --algorithms singletask_ft
run seq_er       python exp_scripts/run_cl_smoke_tpu.py --algorithms sequential_ft,experience_replay --refresh-transfer sequential_ft,experience_replay
run ewc_freeze   python exp_scripts/run_cl_smoke_tpu.py --algorithms ewc,freeze_bottom_k_layers --refresh-transfer ewc,freeze_bottom_k_layers
run viltbert     python exp_scripts/run_cl_smoke_tpu.py --encoder viltbert --tasks vqa,nlvr2 --algorithms singletask_ft,sequential_ft --refresh-transfer sequential_ft
run adapter      python exp_scripts/run_cl_smoke_tpu.py --algorithms adapter --refresh-transfer adapter
run accum_sweep  python exp_scripts/bench_accum_sweep_vs_auto.py
run longseq      python exp_scripts/bench_longseq_language.py
echo "[$(date +%T)] ALL DONE" | tee -a "$LOG/progress.log"
