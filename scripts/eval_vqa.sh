#!/usr/bin/env bash
# VQA MCQ fan-out (reference scripts/eval_VQA.sh: torchrun x8 VLMEvalKit;
# here: VLMEvalKit-format TSV through the VQAChat adapter, worker shards).
set -euo pipefail
MODEL_PATH=${MODEL_PATH:?set MODEL_PATH}
TSV=${TSV:?set TSV to a VLMEvalKit-format MCQ tsv}
OUT_DIR=${OUT_DIR:-output/vqa}
NUM_WORKERS=${NUM_WORKERS:-8}
mkdir -p "$OUT_DIR"
pids=()
for i in $(seq 0 $((NUM_WORKERS - 1))); do
  python -m streaming_vlm_tpu vqa --model_path "$MODEL_PATH" --tsv "$TSV" \
    --out_path "$OUT_DIR/preds_$i.jsonl" --worker "$i" \
    --num_workers "$NUM_WORKERS" > "$OUT_DIR/acc_$i.json" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
python - "$OUT_DIR" << 'PY'
import json, sys, glob
accs = [json.load(open(p)) for p in glob.glob(sys.argv[1] + "/acc_*.json")]
total = sum(a["total"] for a in accs); correct = sum(a["correct"] for a in accs)
print(json.dumps({"total": total, "correct": correct,
                  "accuracy": correct / total if total else 0.0}))
PY
