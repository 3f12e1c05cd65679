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
        # section parity with the reference (inference.py:495-507): PKV /
        # INPUT / GEN are separately fenced, not lumped into GEN
        assert t["GEN"] > 0 and t["INPUT"] > 0
        assert t["gen_time_sec"] >= t["PKV"] + t["INPUT"] + t["GEN"]
    # eviction begins at chunk window_size; PKV must show real time there
    assert any(t["PKV"] > 0 for t in timing[1:])
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


def test_qa_question_train_serve_token_alignment(video_path):
    """Mid-stream qa_stream questions must reach the serve-time prompt in the
    TRAINING position (right after the Time text, reference
    lmm_dataset.py:227-237): driving the session with GT teacher forcing over
    the dataset's turns must reproduce the training example's input_ids
    byte-for-byte (no eviction/truncation)."""
    from streaming_vlm_tpu.data.dataset import StreamDataset
    from streaming_vlm_tpu.serve import StreamingSession
    from streaming_vlm_tpu.video.ingest import patchify_frames

    tok = CFG.tokens
    text_stream = [
        [i * 0.5, i * 0.5 + 0.4, w]
        for i, w in enumerate("one two three four five six seven eight".split())
    ]
    qa_stream = [[1.0, 2.0, " What moves?", "A gradient."]]
    conv = [
        {"role": "user", "content": [{
            "type": "video", "video": video_path,
            "video_start": 0.0, "video_end": 4.0, "previous": "earlier words",
        }]},
        {"role": "assistant", "content": [{
            "type": "text", "text_stream": text_stream, "qa_stream": qa_stream,
        }]},
    ]
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".jsonl", delete=False) as f:
        f.write(json.dumps(conv) + "\n")
        ann = f.name

    encode = FakeTokenizer(tok)
    ds = StreamDataset(
        [ann], cfg=CFG, encode=encode,
        video=VideoConfig(fps=2.0, video_min_pixels=28 * 28,
                          video_max_pixels=16 * 28 * 28),
    )
    ex = ds[0]
    turns, all_frames, previous_text, _ = ds.get_stream(0)
    assert any(t.question for t in turns), "fixture must inject a question"

    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    stream = StreamConfig(
        fps=2.0, chunk_duration=1.0, window_size=1 << 16, text_round=1 << 16,
        text_sink=None, text_sliding_window=None, max_tokens_per_chunk=4,
        kv_capacity=2048, prefill_buckets=(256,),
    )
    # query="" so the round-0 task prompt (a legitimate serve-only addition,
    # reference inference.py:352-362) doesn't mask qa alignment
    session = StreamingSession(
        CFG, params, encode, stream=stream,
        sampling=SamplingConfig(do_sample=False),
        previous_text=previous_text, query="", dtype=jnp.float32,
    )
    for i, turn in enumerate(turns):
        frames = all_frames[turn.frame_indices]
        pad = (-frames.shape[0]) % CFG.vision.temporal_patch_size
        if pad:
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
        patches, grid = patchify_frames(
            frames, patch_size=CFG.vision.patch_size,
            temporal_patch_size=CFG.vision.temporal_patch_size,
            merge_size=CFG.vision.spatial_merge_size,
        )
        forced = np.asarray(encode(turn.assistant_text + "<|im_end|>"), np.int32)
        session.run_chunk(
            i, turn.start, pixel_patches=patches, grid_thw=grid,
            forced_response_ids=forced, question=turn.question,
        )

    served_ids = session.engine.table.token_ids()
    np.testing.assert_array_equal(served_ids, ex.input_ids)
    # and the question's tokens are actually in there
    q_ids = encode(" What moves?")
    s = served_ids.tolist()
    assert any(s[j : j + len(q_ids)] == q_ids for j in range(len(s)))
