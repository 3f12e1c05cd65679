#!/usr/bin/env bash
# Inf-Stream-Eval fan-out (reference eval/model_compete/generate.sh:56-80:
# line-range shards x CUDA_VISIBLE_DEVICES; here: line-range shards x
# local worker processes — single-host TPU devices are one JAX process).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH to the HF checkpoint dir}
EVAL_METADATA=${EVAL_METADATA:?set EVAL_METADATA to eval_all_metadata.jsonl}
OUT_DIR=${OUT_DIR:-output/infstream}
NUM_WORKERS=${NUM_WORKERS:-8}
TOTAL_LINES=$(wc -l < "$EVAL_METADATA")
PER=$(( (TOTAL_LINES + NUM_WORKERS - 1) / NUM_WORKERS ))
mkdir -p "$OUT_DIR"

pids=()
for i in $(seq 0 $((NUM_WORKERS - 1))); do
  START=$((i * PER)); END=$(( (i + 1) * PER ))
  [ "$START" -ge "$TOTAL_LINES" ] && break
  python -m streaming_vlm_tpu infstream generate \
    --model_path "$MODEL_PATH" --eval_metadata "$EVAL_METADATA" \
    --out_path "$OUT_DIR/shard_$i.jsonl" \
    --start_line "$START" --end_line "$END" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done

python -m streaming_vlm_tpu infstream merge \
  --out_path "$OUT_DIR/merged.jsonl" --shards "$OUT_DIR"/shard_*.jsonl
echo "merged -> $OUT_DIR/merged.jsonl"
# score vs a competitor (e.g. the GPT competitor's merged jsonl):
#   python -m streaming_vlm_tpu infstream score --merged_a $OUT_DIR/merged.jsonl \
#     --merged_b competitor.jsonl --eval_metadata $EVAL_METADATA \
#     --out_path $OUT_DIR/votes.jsonl   (needs OPENAI_KEY)
