#!/usr/bin/env bash
# Hyperparameter sweep driver — same grid convention as the reference
# (ref: run.sh:1-52): each variable holds the single published value for the
# MVSA-Single reproduction recipe; widen any list to sweep.
#
# Set D2R_SWEEP_DIR to collect one structured metrics.jsonl per grid point
# (named by the swept values); rank them afterwards with
#   python tools/sweep_report.py "$D2R_SWEEP_DIR"/*.jsonl
set -e

for num_epochs in 20; do
for lr in 1e-5; do
for warmup_ratio in 0.2; do
for seed in 2023; do
for batch_size in 64; do
for max_seq in 64; do
for weight_js_1 in 0.9; do
for weight_js_2 in 0.3; do
for DR_step in 4; do
for weight_diff in 0; do
  metrics_args=()
  if [ -n "${D2R_SWEEP_DIR:-}" ]; then
    mkdir -p "${D2R_SWEEP_DIR}"
    metrics_args=(--metrics_jsonl "${D2R_SWEEP_DIR}/ep${num_epochs}_lr${lr}_wu${warmup_ratio}_s${seed}_b${batch_size}_seq${max_seq}_js${weight_js_1}-${weight_js_2}_dr${DR_step}_wd${weight_diff}.jsonl")
  fi
  python run.py \
    --num_epochs ${num_epochs} \
    --lr ${lr} \
    --warmup_ratio ${warmup_ratio} \
    --seed ${seed} \
    --batch_size ${batch_size} \
    --max_seq ${max_seq} \
    --weight_js_1 ${weight_js_1} \
    --weight_js_2 ${weight_js_2} \
    --DR_step ${DR_step} \
    --weight_diff ${weight_diff} \
    "${metrics_args[@]}" \
    "$@"
done; done; done; done; done; done; done; done; done; done
