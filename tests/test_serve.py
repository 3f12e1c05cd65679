"""End-to-end serve-loop test: tiny model + natively-encoded test video ->
streaming_inference -> responses, VTT file, NDJSON, timing dicts."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import (
    SamplingConfig,
    StreamConfig,
    VideoConfig,
    qwen25_vl_tiny,
)
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.serve import streaming_inference
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer
from streaming_vlm_tpu.video import ingest

CFG = qwen25_vl_tiny()


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serve") / "clip.mp4")
    ingest.build_native()
    # 6 s @ 10 fps, tiny frames (56x84 -> within tiny pixel budget)
    ingest.write_test_video(path, w=84, h=56, n_frames=60, fps=10)
    return path


def test_streaming_inference_end_to_end(video_path, tmp_path):
    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    vtt = str(tmp_path / "out.vtt")

    stream = StreamConfig(
        fps=2.0,
        chunk_duration=1.0,
        window_size=2,
        text_round=2,
        text_sink=4,
        text_sliding_window=4,
        max_tokens_per_chunk=4,
        kv_capacity=2048,
        prefill_buckets=(128, 256),
    )
    video = VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28)

    out = streaming_inference(
        cfg=CFG,
        params=params,
        tokenizer=FakeTokenizer(CFG.tokens),
        video_path=video_path,
        output_dir=vtt,
        stream=stream,
        sampling=SamplingConfig(do_sample=False),
        video=video,
        previous_text="pre text",
        duration=4.0,
        quiet=True,
        time_test=True,
        dtype=jnp.float32,
    )
    responses, timing = out
    assert len(responses) == 4
    assert len(timing) == 4
    for t in timing:
        assert t["decoded_tokens"] >= 1
        assert t["gen_time_sec"] > 0
    for r in responses:
        assert r["end_time"] == r["start_time"] + 1.0

    with open(vtt) as f:
        content = f.read()
    assert content.startswith("WEBVTT")
    assert "00:00:01.000 --> 00:00:02.000" in content


def test_gt_teacher_forcing(video_path):
    """gt_lookup replaces decoded text; next chunks continue from GT ids."""
    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    ftok = FakeTokenizer(CFG.tokens)
    gt = {
        "Time=0.0-1.0s": "alpha",
        "Time=1.0-2.0s": "beta",
    }
    stream = StreamConfig(
        fps=2.0, chunk_duration=1.0, window_size=4, text_round=4,
        text_sink=None, text_sliding_window=None,
        max_tokens_per_chunk=4, kv_capacity=2048, prefill_buckets=(128, 256),
    )
    responses = streaming_inference(
        cfg=CFG,
        params=params,
        tokenizer=ftok,
        video_path=video_path,
        stream=stream,
        sampling=SamplingConfig(do_sample=False),
        video=VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28),
        duration=3.0,
        quiet=True,
        gt_lookup=gt,
        dtype=jnp.float32,
    )
    assert len(responses) == 3


def test_caption_clip_offline(video_path):
    """BASELINE config 1: offline full-attention captioning, CPU-runnable."""
    from streaming_vlm_tpu.serve import caption_clip

    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    out = caption_clip(
        cfg=CFG,
        params=params,
        tokenizer=FakeTokenizer(CFG.tokens),
        video_path=video_path,
        query="describe",
        fps=1.0,
        max_frames=8,
        max_new_tokens=4,
        video=VideoConfig(fps=1.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28),
    )
    assert isinstance(out, str) and len(out) > 0
