"""mRoPE (multimodal 3D rotary position embedding) for Qwen2.5-VL.

Two halves:

1. Host-side position *index* computation (`mrope_positions_from_ids`,
   `mrope_positions_from_segments`). Positions are plain float32 numpy; they
   are computed once per streaming chunk (never per token) and uploaded to the
   device alongside the KV arena. Parity target:
   /root/reference/src/streaming_vlm/inference/qwen2_5/pos_emb.py:6-188 with
   the reference's fixed temporal stride second_per_grid_t = 2/FPS
   (pos_emb.py:104).

2. Device-side rotary application (`mrope_rotate`, `mrope_angles`). The
   mrope_section channel split (language_forward.py:46-67 in the reference)
   becomes a static concatenation of per-axis angle slices, and rotation is a
   plain VPU elementwise op that XLA fuses into the surrounding attention.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Host-side position index computation
# ---------------------------------------------------------------------------


def mrope_positions_from_ids(
    input_ids: np.ndarray,
    video_grid_thw: Optional[np.ndarray],
    *,
    spatial_merge_size: int,
    tokens_per_second: float,
    second_per_grid_ts: Optional[Sequence[float]],
    image_grid_thw: Optional[np.ndarray] = None,
    video_token_id: int = 151656,
    image_token_id: int = 151655,
) -> Tuple[np.ndarray, float]:
    """Scan-based 3D position assignment over a flat token sequence.

    Returns (positions [3, L] float32, mrope_delta). Mirrors the reference's
    get_rope_index (pos_emb.py:6-188): text tokens get equal (t,h,w) indices
    counting up; each vision block gets t = grid_t steps scaled by
    second_per_grid_t * tokens_per_second, h/w raster indices, all offset so
    the block starts right after the preceding text; the next text token
    starts at max(previous positions) + 1.
    """
    ids = np.asarray(input_ids).reshape(-1)
    n = ids.shape[0]
    positions = np.zeros((3, n), dtype=np.float32)

    vid_blocks = [] if video_grid_thw is None else list(np.asarray(video_grid_thw))
    img_blocks = [] if image_grid_thw is None else list(np.asarray(image_grid_thw))

    vision_tok = np.zeros(n, dtype=bool)
    vision_tok |= ids == video_token_id
    vision_tok |= ids == image_token_id

    cursor = 0  # write cursor into positions
    next_start = 0.0
    vid_i = 0
    img_i = 0
    while cursor < n:
        if not vision_tok[cursor]:
            # text run
            run_end = cursor
            while run_end < n and not vision_tok[run_end]:
                run_end += 1
            ln = run_end - cursor
            positions[:, cursor:run_end] = np.arange(ln, dtype=np.float32) + next_start
            next_start = next_start + ln
            cursor = run_end
        else:
            is_video = ids[cursor] == video_token_id
            if is_video:
                t, h, w = (int(x) for x in vid_blocks[vid_i])
                if second_per_grid_ts is not None:
                    spgt = float(second_per_grid_ts[vid_i])
                else:
                    spgt = 1.0
                vid_i += 1
            else:
                t, h, w = (int(x) for x in img_blocks[img_i])
                spgt = 0.0
                img_i += 1
            gh = h // spatial_merge_size
            gw = w // spatial_merge_size
            block = t * gh * gw
            t_idx = np.repeat(
                np.arange(t, dtype=np.float32) * spgt * tokens_per_second, gh * gw
            )
            h_idx = np.tile(np.repeat(np.arange(gh, dtype=np.float32), gw), t)
            w_idx = np.tile(np.arange(gw, dtype=np.float32), t * gh)
            pos3 = np.stack([t_idx, h_idx, w_idx]) + next_start
            positions[:, cursor : cursor + block] = pos3
            next_start = float(pos3.max()) + 1.0
            cursor += block

    delta = float(positions.max()) + 1.0 - n if n else 0.0
    return positions, delta


@dataclasses.dataclass(frozen=True)
class PosSegment:
    """A positional segment: either a text run or one vision block.

    The streaming engine tracks these explicitly instead of re-scanning
    token ids each chunk (SURVEY.md design stance 3)."""

    kind: str  # "text" | "video" | "image"
    length: int  # number of tokens (text) — ignored for vision
    grid_thw: Optional[Tuple[int, int, int]] = None
    second_per_grid_t: float = 1.0


def mrope_positions_from_segments(
    segments: Sequence[PosSegment],
    *,
    spatial_merge_size: int,
    tokens_per_second: float,
) -> np.ndarray:
    """Assign contiguous 3D positions from an explicit segment list.

    Equivalent to `mrope_positions_from_ids` on the concatenated token
    sequence, but O(#segments) instead of O(#tokens) of python-level work.
    This is what the streaming engine runs after every eviction to realise
    the reference's "shrink" contiguous re-indexing (model_forward.py:101-110)
    without per-token rescans.
    """
    chunks: List[np.ndarray] = []
    next_start = 0.0
    for seg in segments:
        if seg.kind == "text":
            ln = seg.length
            pos = np.broadcast_to(
                np.arange(ln, dtype=np.float32) + next_start, (3, ln)
            ).copy()
            next_start += ln
        else:
            t, h, w = seg.grid_thw
            gh = h // spatial_merge_size
            gw = w // spatial_merge_size
            spgt = 0.0 if seg.kind == "image" else seg.second_per_grid_t
            t_idx = np.repeat(
                np.arange(t, dtype=np.float32) * spgt * tokens_per_second, gh * gw
            )
            h_idx = np.tile(np.repeat(np.arange(gh, dtype=np.float32), gw), t)
            w_idx = np.tile(np.arange(gw, dtype=np.float32), t * gh)
            pos = np.stack([t_idx, h_idx, w_idx]) + next_start
            next_start = float(pos.max()) + 1.0
        chunks.append(pos)
    if not chunks:
        return np.zeros((3, 0), dtype=np.float32)
    return np.concatenate(chunks, axis=1)


def text_positions_1d(length: int, start: float) -> np.ndarray:
    """1-D positions replicated over (t,h,w) — used in all_text mode and for
    generated text tokens."""
    return np.broadcast_to(np.arange(length, dtype=np.float32) + start, (3, length)).copy()


# ---------------------------------------------------------------------------
# Device-side rotary application
# ---------------------------------------------------------------------------


def make_inv_freq(head_dim: int, rope_theta: float) -> np.ndarray:
    return 1.0 / (
        rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    )


def mrope_angles(
    positions: jnp.ndarray,  # [3, L] float32
    inv_freq: jnp.ndarray,  # [head_dim // 2]
    mrope_section: Tuple[int, int, int],
) -> jnp.ndarray:
    """Per-token rotary angles [L, head_dim // 2] with the t/h/w channel split.

    mrope_section (e.g. (16, 24, 24)) partitions the head_dim//2 frequency
    channels; channels in section s use the positions of axis s. Equivalent to
    the reference's interleaved split at language_forward.py:46-67, expressed
    as a static concat so XLA sees fixed shapes.
    """
    angles3 = positions[:, :, None] * inv_freq[None, None, :]  # [3, L, F]
    s0, s1, s2 = mrope_section
    return jnp.concatenate(
        [
            angles3[0, :, :s0],
            angles3[1, :, s0 : s0 + s1],
            angles3[2, :, s0 + s1 : s0 + s1 + s2],
        ],
        axis=-1,
    )


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    x: jnp.ndarray,  # [..., L, head_dim]
    cos: jnp.ndarray,  # [L, head_dim//2] or broadcastable
    sin: jnp.ndarray,
) -> jnp.ndarray:
    """Rotate with the duplicated-half convention: emb = cat(freqs, freqs).

    Lowered via a [..., 2, hd/2] stacked view instead of the textbook
    `x*cat(c,c) + rotate_half(x)*cat(s,s)`: the negate-and-concatenate temp
    defeats XLA fusion on the big arena rotate (measured 3.1 -> 1.7 ms per
    chunk on [36, 10240, 2, 128] v5e — tools/profile_variants.py). Exactly
    the same arithmetic: out1 = x1*c - x2*s, out2 = x2*c + x1*s."""
    h2 = x.shape[-1] // 2
    xs = x.reshape(*x.shape[:-1], 2, h2)
    x1 = xs[..., 0, :]
    x2 = xs[..., 1, :]
    out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-2)
    return out.reshape(x.shape).astype(x.dtype)


def mrope_cos_sin(
    positions: jnp.ndarray,  # [3, L]
    inv_freq: jnp.ndarray,
    mrope_section: Tuple[int, int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ang = mrope_angles(positions.astype(jnp.float32), inv_freq, mrope_section)
    return jnp.cos(ang), jnp.sin(ang)
