#!/usr/bin/env bash
# SFT stage 1 (reference scripts/sft_stage_1.sh: 8xGPU ZeRO-3, lr 1e-5,
# grad-accum 64, frozen ViT, save every 20 optimizer steps, limit 10).
# On TPU the mesh/FSDP sharding replaces ZeRO-3 (parallel/mesh.py); one JAX
# process drives all local devices.
set -euo pipefail
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH}
TRAIN_JSONL=${TRAIN_JSONL:?set TRAIN_JSONL}
OUTPUT_DIR=${OUTPUT_DIR:-runs/sft_stage_1}
python -m streaming_vlm_tpu train \
  --model_path "$MODEL_PATH" \
  --train_annotation_paths "$TRAIN_JSONL" \
  --output_dir "$OUTPUT_DIR" \
  --learning_rate 1e-5 --grad_accum 64 --save_steps 20 "$@"
