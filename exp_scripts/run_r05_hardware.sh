#!/usr/bin/env bash
# Round-5 hardware evidence matrix, serialized on the one real TPU chip.
# Everything runs at the r05 config (synthetic_noise 0.3 + repeated-marker
# signal): per-task Bayes ceilings ~70-85, so CL algorithms SEPARATE
# (r04 verdict item 2) and VQA can clear 30 (item 6).
#
# Legs in leverage order (r04 verdict items 1-3):
#   1. singletask_ft baselines      -> relative_gain denominators
#   2. sequential_ft + ER           -> the headline comparison pair
#   3. ewc + freeze_bottom_k        -> first-ever full driver stack on chip
#   4. adapter                      -> completes the vilt algorithm matrix
#   5. viltbert (2-task)            -> first hardware ViLT-BERT sequence
#   6. phase2                       -> Phase II at the learnable config
#                                      (needs leg 2's checkpoints)
#   7. accum sweep vs auto          -> ACCUM_SWEEP_r05.json
#   8. long-seq language A/B        -> LONGSEQ_r05.json
#
# Every leg is bounded with `timeout -k`: a tunnel-wedged driver ignores
# SIGTERM (the preemption flag is polled at step boundaries it never
# reaches), so timeout's follow-up SIGKILL is required (ROUNDLOG r04).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r05_hw
mkdir -p "$LOG"
run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[$(date +%T)] START $name" | tee -a "$LOG/progress.log"
  timeout -k 60 "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "[$(date +%T)] DONE  $name rc=$rc" | tee -a "$LOG/progress.log"
  return $rc
}

run singletask 10800 python exp_scripts/run_cl_smoke_tpu.py --algorithms singletask_ft
run seq_er     10800 python exp_scripts/run_cl_smoke_tpu.py --algorithms sequential_ft,experience_replay --refresh-transfer sequential_ft,experience_replay
run ewc_freeze 10800 python exp_scripts/run_cl_smoke_tpu.py --algorithms ewc,freeze_bottom_k_layers --refresh-transfer ewc,freeze_bottom_k_layers
run adapter     7200 python exp_scripts/run_cl_smoke_tpu.py --algorithms adapter --refresh-transfer adapter
run viltbert    7200 python exp_scripts/run_cl_smoke_tpu.py --encoder viltbert --tasks vqa,nlvr2 --algorithms singletask_ft,sequential_ft --refresh-transfer sequential_ft
run phase2      7200 python exp_scripts/run_phase2_smoke_tpu.py
run accum_sweep 5400 python exp_scripts/bench_accum_sweep_vs_auto.py
run longseq     5400 python exp_scripts/bench_longseq_language.py
echo "[$(date +%T)] ALL DONE" | tee -a "$LOG/progress.log"
