#!/usr/bin/env bash
# OVO-Bench MCQ fan-out (reference scripts/eval_OVOBench.sh: torchrun x8).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH}
BENCHMARK=${BENCHMARK:?set BENCHMARK to the formatted MCQ jsonl}
VIDEO_ROOT=${VIDEO_ROOT:-}
OUT_DIR=${OUT_DIR:-output/ovobench}
NUM_WORKERS=${NUM_WORKERS:-8}
mkdir -p "$OUT_DIR"
pids=()
for i in $(seq 0 $((NUM_WORKERS - 1))); do
  python -m streaming_vlm_tpu ovobench --model_path "$MODEL_PATH" \
    --benchmark_path "$BENCHMARK" --video_root "$VIDEO_ROOT" \
    --out_path "$OUT_DIR/preds_$i.jsonl" --worker "$i" \
    --num_workers "$NUM_WORKERS" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
cat "$OUT_DIR"/preds_*.jsonl > "$OUT_DIR/preds.jsonl"
echo "predictions -> $OUT_DIR/preds.jsonl"
