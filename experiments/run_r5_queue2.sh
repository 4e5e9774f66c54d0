#!/bin/bash
# Round-5 queue, part 2 (after the mobile_vit row): remaining VERDICT items
# in priority order — protocol mean (#4), quality-v2 pending arms (#3),
# host-PIL stream bench (#6), flagship variance (#7).
set -u
cd "$(dirname "$0")/.."
LOG=experiments/results/r5_queue2.log
echo "=== r5 queue2 start $(date) sha=$(git rev-parse --short HEAD) ===" >> "$LOG"

run() {
  echo "--- $(date +%H:%M:%S) $* ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S) ---" >> "$LOG"
}

run python experiments/run_protocol.py --tag r5 --attempts 3 --edisp 25

QUALITY_V2_GEN=g2 QUALITY_V2_SUBDIR=g2_ov0.001 \
  run python experiments/run_quality_v2.py

run python experiments/bench_stream.py

run python experiments/run_family_bench.py --no-warm \
    vit_som_cluster_24 desom
run python experiments/run_family_bench.py --no-warm \
    vit_som_cluster_24 desom

QUALITY_V2_EPOCHS=120 QUALITY_V2_SUBDIR=g4_seed_diag \
  run python experiments/run_quality_v2.py ctrl_2 ctrl_3 xla_bf16_2
QUALITY_V2_OVERLAP=0.1 QUALITY_V2_SUBDIR=overlap_0.1 \
  run python experiments/run_quality_v2.py \
  xla_bf16s_1 xla_bf16s_2 xla_bf16s_3 bf16h_0 bf16h_1 bf16h_2 bf16h_3

echo "=== r5 queue2 done $(date) ===" >> "$LOG"
