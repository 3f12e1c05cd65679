#!/usr/bin/env bash
# LiveSports-3K-CC fan-out (reference eval/livesports3kcc/
# distributed_generate_*.py: one worker per device, idx round-robin).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH}
EVENTS=${EVENTS:?set EVENTS to the LiveSports events jsonl}
OUT_ROOT=${OUT_ROOT:-output/livesports}
NUM_WORKERS=${NUM_WORKERS:-8}
MODE=${MODE:-streaming}   # streaming | livecc | caption

pids=()
for i in $(seq 0 $((NUM_WORKERS - 1))); do
  python -m streaming_vlm_tpu livesports "$MODE" \
    --model_path "$MODEL_PATH" --events_path "$EVENTS" \
    --out_dir "$OUT_ROOT/$MODE" --worker "$i" --num_workers "$NUM_WORKERS" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
python -m streaming_vlm_tpu livesports merge \
  --out_dir "$OUT_ROOT/$MODE" --out_path "$OUT_ROOT/$MODE.jsonl"
# judge (needs OPENAI_KEY):
#   python -m streaming_vlm_tpu livesports judge --events_path $EVENTS \
#     --out_dir $OUT_ROOT/streaming --out_path $OUT_ROOT/votes.jsonl
