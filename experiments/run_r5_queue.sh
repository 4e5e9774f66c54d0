#!/bin/bash
# Round-5 recording queue (VERDICT r4 "Next round: do this").
# Strictly sequential — ONE timed chip run at a time; every row behind a
# compile-only warm + in-process pre-execution (VITSOM_PREEXEC, see
# benchmarking/train.py). Order = verdict priority: the four stale cls rows
# + the missing mobile_vit row first, then cluster_40 re-record, then the
# protocol mean, then quality arms, stream bench, variance runs.
set -u
cd "$(dirname "$0")/.."
LOG=experiments/results/r5_queue.log
echo "=== r5 queue start $(date) sha=$(git rev-parse --short HEAD) ===" >> "$LOG"

run() {
  echo "--- $(date +%H:%M:%S) $* ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S) ---" >> "$LOG"
}

# Phase 1+2: classification rows (VERDICT #1) + mobile_vit (#2) + cluster_40 (#5)
run python experiments/run_family_bench.py --warm-timeout=2400 \
    vit_som_cls deit swin vit mobile_vit vit_som_cluster_40

# Phase 3: protocol mean >= 5x (VERDICT #4) — n=3 at HEAD
run python experiments/run_protocol.py --tag r5 --attempts 3 --edisp 25

# Phase 4: quality study (VERDICT #3) — stable g2 operating point, full
# matrix; g4 seed-collapse diagnosis (seed 2/3 at 120 epochs); complete the
# overlap_0.1 arm
QUALITY_V2_GEN=g2 QUALITY_V2_SUBDIR=g2_ov0.001 \
  run python experiments/run_quality_v2.py
QUALITY_V2_EPOCHS=120 QUALITY_V2_SUBDIR=g4_seed_diag \
  run python experiments/run_quality_v2.py ctrl_2 ctrl_3 xla_bf16_2
QUALITY_V2_OVERLAP=0.1 QUALITY_V2_SUBDIR=overlap_0.1 \
  run python experiments/run_quality_v2.py \
  xla_bf16s_1 xla_bf16s_2 xla_bf16s_3 bf16h_0 bf16h_1 bf16h_2 bf16h_3

# Phase 5: host-PIL stream bench (VERDICT #6) — flowers-17 shape
run python experiments/bench_stream.py

# Phase 6: variance (VERDICT #7) — flagship rows to n>=3 at HEAD.
# --no-warm: the persistent compile cache is hot after phase 1/2 and the
# in-process pre-execution (VITSOM_PREEXEC) warms each run's executables
# untimed; every attempt lands in attempts.jsonl for the runs arrays.
run python experiments/run_family_bench.py --no-warm \
    vit_som_cluster_24 desom vit_som_cls
run python experiments/run_family_bench.py --no-warm \
    vit_som_cluster_24 desom vit_som_cls
run python experiments/run_family_bench.py --no-warm \
    vit_som_cluster_24 desom

echo "=== r5 queue done $(date) ===" >> "$LOG"
