"""VQA adapter: a VLMEvalKit-style chat interface over the offline model.

The reference vendors VLMEvalKit (~103k LoC) and registers StreamingVLM as a
plain Qwen2VLChat with max_new_tokens=1 for MCQ suites
(eval/VLMEvalKit/vlmeval/config.py:1270-1278, scripts/eval_VQA.sh). Instead of
vendoring, this adapter exposes the same `generate(message) -> str` surface so
VLMEvalKit (or any compatible harness) can drive our model; MCQ answers come
from a single forward (argmax over the first generated token), matching the
reference's max_new_tokens=1 usage.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..config import ModelConfig, VideoConfig


class VQAChat:
    """message: list of {"type": "image"|"text", "value": path_or_text}."""

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        encode: Callable[[str], List[int]],
        decode: Callable[[List[int]], str],
        *,
        max_new_tokens: int = 1,
        min_pixels: int = 100 * 28 * 28,
        max_pixels: int = 512 * 28 * 28,
        system_prompt: str = "You are a helpful assistant.",
    ):
        self.cfg = cfg
        self.params = params
        self.encode = encode
        self.decode = decode
        self.max_new_tokens = max_new_tokens
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.system_prompt = system_prompt

    def _load_image(self, path: str) -> np.ndarray:
        from PIL import Image

        from ..video.ingest import smart_resize

        img = Image.open(path).convert("RGB")
        w, h = img.size
        rh, rw = smart_resize(
            h, w,
            factor=self.cfg.vision.patch_size * self.cfg.vision.spatial_merge_size,
            min_pixels=self.min_pixels,
            max_pixels=self.max_pixels,
        )
        img = img.resize((rw, rh), Image.BICUBIC)
        return np.asarray(img, np.uint8)[None]  # [1, H, W, 3]

    def generate(self, message: Sequence[Dict], dataset: Optional[str] = None) -> str:
        import jax.numpy as jnp

        from ..models.qwen25_vl import model
        from ..video.ingest import patchify_frames

        tok = self.cfg.tokens
        text_parts: List[str] = []
        pixel_parts: List[np.ndarray] = []
        grids: List = []
        body = ""
        for item in message:
            if item["type"] == "image":
                frames = self._load_image(item["value"])
                patches, grid = patchify_frames(
                    frames,
                    patch_size=self.cfg.vision.patch_size,
                    temporal_patch_size=self.cfg.vision.temporal_patch_size,
                    merge_size=self.cfg.vision.spatial_merge_size,
                )
                pixel_parts.append(patches)
                grids.append(grid)
                n = patches.shape[0] // self.cfg.vision.spatial_merge_unit
                body += f"<|vision_start|>{'<|image_pad|>' * n}<|vision_end|>"
            else:
                body += str(item["value"])
        prompt = (
            f"<|im_start|>system\n{self.system_prompt}<|im_end|>\n"
            f"<|im_start|>user\n{body}<|im_end|>\n<|im_start|>assistant\n"
        )
        ids = np.asarray(self.encode(prompt), np.int32)
        pixels = (
            jnp.asarray(np.concatenate(pixel_parts)) if pixel_parts else None
        )
        image_grids = np.array([list(g) for g in grids]) if grids else None

        out: List[int] = []
        for _ in range(self.max_new_tokens):
            logits = np.asarray(
                model.forward_full(
                    self.cfg,
                    self.params,
                    ids,
                    pixel_patches=pixels,
                    video_grid_thw=None,
                    second_per_grid_ts=None,
                    image_grid_thw=image_grids,
                )
            )[-1]
            nxt = int(np.argmax(logits))
            if nxt == tok.im_end:
                break
            out.append(nxt)
            ids = np.concatenate([ids, [nxt]]).astype(np.int32)
        return self.decode(out)


# ---------------------------------------------------------------------------
# Minimal VLMEvalKit-protocol MCQ runner: drives VQAChat with the kit's
# ImageMCQDataset TSV format and prompt construction
# (reference eval/VLMEvalKit/vlmeval/dataset/image_mcq.py build_prompt:
# Hint/Question/Options/"Please select the correct answer..."), so a
# kit-format dataset runs end-to-end without vendoring the 103k-LoC kit.
# ---------------------------------------------------------------------------

MCQ_INSTRUCTION = "Please select the correct answer from the options above. \n"


def build_mcq_message(row: Dict, image_dir: str) -> List[Dict]:
    """VLMEvalKit ImageMCQDataset.build_prompt over one TSV row. The 'image'
    column holds base64 image bytes (the kit's transport format); decoded
    files are dumped under image_dir like the kit's dump_image."""
    import base64
    import os
    import string

    msgs: List[Dict] = []
    if row.get("image"):
        path = os.path.join(image_dir, f"{row['index']}.png")
        if not os.path.exists(path):
            with open(path, "wb") as f:
                f.write(base64.b64decode(row["image"]))
        msgs.append({"type": "image", "value": path})
    elif row.get("image_path"):
        msgs.append({"type": "image", "value": row["image_path"]})

    options = {
        c: row[c]
        for c in string.ascii_uppercase
        if row.get(c) not in (None, "", "nan")
    }
    prompt = ""
    if row.get("hint") and row["hint"] != "nan":
        prompt += f"Hint: {row['hint']}\n"
    prompt += f"Question: {row['question']}\n"
    if options:
        prompt += "Options:\n"
        for k, v in options.items():
            prompt += f"{k}. {v}\n"
        prompt += MCQ_INSTRUCTION
    msgs.append({"type": "text", "value": prompt})
    return msgs


def extract_option(pred: str, options: Sequence[str]) -> Optional[str]:
    """Exact-match option extraction (the kit's first-stage matcher)."""
    s = pred.strip()
    if not s:
        return None
    head = s[0].upper()
    if head in options:
        return head
    for opt in options:
        if s.upper().startswith(f"{opt}.") or s.upper() == opt:
            return opt
    return None


def run_mcq_tsv(
    chat: "VQAChat",
    tsv_path: str,
    out_path: str,
    *,
    image_dir: Optional[str] = None,
    worker: int = 0,
    num_workers: int = 1,
) -> Dict[str, float]:
    """Run a VLMEvalKit-format MCQ TSV through the chat adapter; write
    per-item predictions jsonl and return accuracy."""
    import csv
    import json
    import os
    import string

    image_dir = image_dir or (os.path.splitext(out_path)[0] + "_images")
    os.makedirs(image_dir, exist_ok=True)
    with open(tsv_path, newline="") as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    n_correct, n_total = 0, 0
    with open(out_path, "w") as fout:
        for i, row in enumerate(rows):
            if i % num_workers != worker:
                continue
            msgs = build_mcq_message(row, image_dir)
            pred = chat.generate(msgs, dataset="MCQ")
            opts = [
                c for c in string.ascii_uppercase if row.get(c) not in (None, "", "nan")
            ]
            choice = extract_option(pred, opts)
            hit = choice is not None and choice == row.get("answer")
            n_total += 1
            n_correct += int(hit)
            fout.write(
                json.dumps(
                    {
                        "index": row.get("index"),
                        "prediction": pred,
                        "choice": choice,
                        "answer": row.get("answer"),
                        "hit": int(hit),
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )
    return {"total": n_total, "correct": n_correct,
            "accuracy": n_correct / n_total if n_total else 0.0}
