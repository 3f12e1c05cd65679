#!/usr/bin/env bash
# SFT stage 2: continue from stage 1's output on the stage-2 mixture
# (reference scripts/sft_stage_2.sh — same recipe, new data + init).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH (stage-1 output)}
TRAIN_JSONL=${TRAIN_JSONL:?set TRAIN_JSONL (stage-2 mixture)}
OUTPUT_DIR=${OUTPUT_DIR:-runs/sft_stage_2}
python -m streaming_vlm_tpu train \
  --model_path "$MODEL_PATH" \
  --train_annotation_paths "$TRAIN_JSONL" \
  --output_dir "$OUTPUT_DIR" \
  --learning_rate 1e-5 --grad_accum 64 --save_steps 20 "$@"
