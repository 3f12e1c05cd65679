"""Full Qwen2.5-VL model: vision tower + multimodal merge + language model.

Parity targets (file:line in /root/reference):
  * vision-embed scatter into token slots:
    src/streaming_vlm/inference/qwen2_5/model_forward.py:57-93
  * top-level forward + logits: model_forward.py:221-334
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import ModelConfig
from . import language, vision
from .rope import mrope_positions_from_ids

Params = Dict[str, Any]


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    kv, kt = jax.random.split(key)
    return {
        "vision": vision.init_vision_params(cfg.vision, kv, dtype),
        "text": language.init_language_params(cfg.text, kt, dtype),
    }


def encode_video(
    cfg: ModelConfig,
    params: Params,
    pixel_patches: jnp.ndarray,  # [S, in_ch * tps * ps * ps]
    grid_thw: Tuple[Tuple[int, int, int], ...],
) -> jnp.ndarray:
    """Run the vision tower for the given grids. Returns [S // merge_unit, D_text]."""
    v = cfg.vision
    geo = vision.vision_geometry(
        tuple(tuple(int(x) for x in g) for g in grid_thw),
        v.window_size,
        v.spatial_merge_size,
        v.patch_size,
    )
    ang = vision.vision_rope_angles(geo["pos_ids"], v.head_dim, v.rope_theta)
    return vision.vision_forward(
        v,
        params["vision"],
        pixel_patches,
        rope_angles=jnp.asarray(ang),
        patch_perm=jnp.asarray(geo["patch_perm"]),
        reverse_unit_perm=jnp.asarray(geo["reverse"]),
        win_seg=jnp.asarray(geo["win_seg"]),
        full_seg=jnp.asarray(geo["full_seg"]),
    )


def merge_vision_embeds(
    embeds: jnp.ndarray,  # [T, D] token embeddings
    vision_embeds: Optional[jnp.ndarray],  # [N_vis, D]
    vision_slots: Optional[jnp.ndarray],  # [N_vis] int32 positions of video/image tokens
) -> jnp.ndarray:
    """Scatter vision embeddings into their token slots (static-index scatter;
    slot indices are host-known because the prompt builder emits them)."""
    if vision_embeds is None:
        return embeds
    return embeds.at[vision_slots].set(vision_embeds.astype(embeds.dtype))


def forward_full(
    cfg: ModelConfig,
    params: Params,
    input_ids: np.ndarray,  # [T] host ints
    *,
    pixel_patches: Optional[jnp.ndarray] = None,
    video_grid_thw: Optional[np.ndarray] = None,
    second_per_grid_ts: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Offline full-attention forward: returns [T, V] float32 logits.

    This is the parity/captioning path (BASELINE config 1) — full causal
    attention, mRoPE positions computed from the token sequence.
    """
    ids_np = np.asarray(input_ids).reshape(-1)
    positions, _ = mrope_positions_from_ids(
        ids_np,
        video_grid_thw,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        tokens_per_second=cfg.vision.tokens_per_second,
        second_per_grid_ts=second_per_grid_ts,
        video_token_id=cfg.tokens.video_pad,
        image_token_id=cfg.tokens.image_pad,
    )

    ids = jnp.asarray(ids_np, jnp.int32)
    embeds = language.embed_tokens(cfg.text, params["text"], ids)

    if pixel_patches is not None:
        vis = encode_video(
            cfg, params, pixel_patches, tuple(tuple(int(x) for x in g) for g in video_grid_thw)
        )
        (slots,) = np.nonzero(ids_np == cfg.tokens.video_pad)
        embeds = merge_vision_embeds(embeds, vis, jnp.asarray(slots, jnp.int32))

    hidden, _ = language.language_forward(
        cfg.text, params["text"], embeds, jnp.asarray(positions)
    )
    return language.lm_logits(cfg.text, params["text"], hidden)
