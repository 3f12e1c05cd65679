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
