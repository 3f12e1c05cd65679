"""mRoPE position-index parity vs the HF Qwen2.5-VL oracle.

The oracle is transformers' Qwen2_5_VLModel.get_rope_index (the stock
implementation the reference patches at
/root/reference/src/streaming_vlm/inference/qwen2_5/pos_emb.py — identical
math when second_per_grid_ts is passed explicitly)."""

import numpy as np
import pytest

from streaming_vlm_tpu.config import qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl.rope import (
    PosSegment,
    mrope_positions_from_ids,
    mrope_positions_from_segments,
)

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
MERGE = CFG.vision.spatial_merge_size
TPS = CFG.vision.tokens_per_second


def build_sequence(rng, blocks):
    """blocks: list of ('text', n) / ('video', (t,h,w)) / ('image', (t,h,w)).
    Returns ids, video_grid, image_grid arrays."""
    ids = []
    vids, imgs = [], []
    for kind, arg in blocks:
        if kind == "text":
            ids.extend(rng.integers(5, 900, size=arg).tolist())
        elif kind == "video":
            t, h, w = arg
            n = t * (h // MERGE) * (w // MERGE)
            ids.extend([TOK.vision_start] + [TOK.video_pad] * n + [TOK.vision_end])
            vids.append((t, h, w))
        else:
            t, h, w = arg
            n = t * (h // MERGE) * (w // MERGE)
            ids.extend([TOK.vision_start] + [TOK.image_pad] * n + [TOK.vision_end])
            imgs.append((t, h, w))
    return (
        np.array(ids, dtype=np.int64),
        np.array(vids, dtype=np.int64) if vids else None,
        np.array(imgs, dtype=np.int64) if imgs else None,
    )


def hf_rope_index(ids, video_grid, image_grid, spgt):
    import torch
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import Qwen2_5_VLModel

    hf_cfg = Qwen2_5_VLConfig(
        vocab_size=1024,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=1,
        num_attention_heads=4,
        num_key_value_heads=2,
        vision_config=dict(
            depth=1,
            hidden_size=64,
            intermediate_size=128,
            num_heads=4,
            out_hidden_size=64,
            spatial_merge_size=MERGE,
            tokens_per_second=TPS,
        ),
        rope_scaling=dict(type="mrope", mrope_section=[2, 3, 3]),
    )
    hf_cfg.image_token_id = TOK.image_pad
    hf_cfg.video_token_id = TOK.video_pad
    hf_cfg.vision_start_token_id = TOK.vision_start

    model = Qwen2_5_VLModel(hf_cfg)
    pos, delta = model.get_rope_index(
        input_ids=torch.tensor(ids)[None],
        image_grid_thw=torch.tensor(image_grid) if image_grid is not None else None,
        video_grid_thw=torch.tensor(video_grid) if video_grid is not None else None,
        second_per_grid_ts=torch.tensor(spgt, dtype=torch.float32)
        if spgt is not None
        else None,
        attention_mask=torch.ones(1, len(ids), dtype=torch.long),
    )
    return pos[:, 0].numpy().astype(np.float32), float(delta[0, 0])


CASES = [
    [("text", 7), ("video", (2, 4, 6)), ("text", 5)],
    [("text", 3), ("video", (1, 2, 2)), ("text", 2), ("video", (3, 4, 4)), ("text", 9)],
    [("video", (2, 2, 2)), ("text", 1)],
    [("text", 11)],
    [("text", 4), ("image", (1, 4, 4)), ("text", 3), ("video", (2, 2, 4)), ("text", 6)],
]


# NOTE: HF >= 4.5x truncates second_per_grid_t to int64
# (time_tensor_long in modeling_qwen2_5_vl.get_rope_index), while the
# reference keeps float32 positions with fractional temporal strides
# (/root/reference/.../qwen2_5/pos_emb.py:125-127). We follow the reference;
# the HF-oracle comparison therefore only uses integer strides, and the
# fractional case is pinned in test_fractional_temporal_stride below.
@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("spgt_val", [1.0, 2.0, 3.0])
def test_positions_match_hf(case, spgt_val):
    rng = np.random.default_rng(0)
    ids, vg, ig = build_sequence(rng, case)
    n_vid = 0 if vg is None else len(vg)
    spgt = [spgt_val] * n_vid if n_vid else None

    ours, delta_ours = mrope_positions_from_ids(
        ids,
        vg,
        spatial_merge_size=MERGE,
        tokens_per_second=TPS,
        second_per_grid_ts=spgt,
        image_grid_thw=ig,
        video_token_id=TOK.video_pad,
        image_token_id=TOK.image_pad,
    )
    theirs, delta_hf = hf_rope_index(ids, vg, ig, spgt)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-5)
    assert abs(delta_ours - delta_hf) < 1e-5


def test_fractional_temporal_stride():
    """Reference semantics: float32 positions, t-step = spgt * tokens_per_second
    even when fractional (pos_emb.py:104,125-127)."""
    ids, vg, _ = build_sequence(np.random.default_rng(2), [("text", 2), ("video", (3, 2, 2)), ("text", 1)])
    pos, _ = mrope_positions_from_ids(
        ids,
        vg,
        spatial_merge_size=MERGE,
        tokens_per_second=TPS,
        second_per_grid_ts=[0.25],  # step = 0.25 * 2 = 0.5
        video_token_id=TOK.video_pad,
        image_token_id=TOK.image_pad,
    )
    # text(2) + vision_start(1) = 3 text tokens, vision starts at 3;
    # grid is (3, 2//2, 2//2) -> 1 token per temporal slice
    block = pos[0, 3:6]
    np.testing.assert_allclose(block, [3.0, 3.5, 4.0])
    # following text (vision_end) starts at max + 1: t max 4.0 -> 5.0
    assert pos[0, 6] == 5.0 and pos[0, 7] == 6.0


@pytest.mark.parametrize("case", CASES)
def test_segment_positions_match_scan(case):
    """Segment-table position assignment == token-scan assignment."""
    rng = np.random.default_rng(1)
    ids, vg, ig = build_sequence(rng, case)
    n_vid = 0 if vg is None else len(vg)
    spgt = [0.5] * n_vid if n_vid else None

    scan_pos, _ = mrope_positions_from_ids(
        ids,
        vg,
        spatial_merge_size=MERGE,
        tokens_per_second=TPS,
        second_per_grid_ts=spgt,
        image_grid_thw=ig,
        video_token_id=TOK.video_pad,
        image_token_id=TOK.image_pad,
    )

    segments = []
    vi = 0
    for kind, arg in case:
        if kind == "text":
            # text block plus the adjacent vision_start/end markers are all text
            segments.append(PosSegment("text", arg))
        else:
            t, h, w = arg
            segments.append(PosSegment("text", 1))  # <|vision_start|>
            segments.append(
                PosSegment(
                    kind,
                    t * (h // MERGE) * (w // MERGE),
                    grid_thw=(t, h, w),
                    second_per_grid_t=0.5,
                )
            )
            segments.append(PosSegment("text", 1))  # <|vision_end|>
            vi += 1

    seg_pos = mrope_positions_from_segments(
        segments, spatial_merge_size=MERGE, tokens_per_second=TPS
    )
    np.testing.assert_allclose(seg_pos, scan_pos, rtol=0, atol=1e-5)
