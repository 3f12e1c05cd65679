"""Live demo tests: SSE server over HTTP, live segment source with the tiny
model, caption-bubble renderer through the native encoder."""

import json
import urllib.request

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
from streaming_vlm_tpu.demo.app import LiveCaptionServer, stream_segments
from streaming_vlm_tpu.demo.render import draw_bubble, render_caption_video
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer
from streaming_vlm_tpu.video import ingest

CFG = qwen25_vl_tiny()


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("demo") / "clip.mp4")
    ingest.build_native()
    ingest.write_test_video(path, w=84, h=56, n_frames=60, fps=10)
    return path


@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def test_sse_server_roundtrip(video_path):
    segs = [
        {"start": 0.0, "end": 1.0, "text": "hello"},
        {"start": 1.0, "end": 2.0, "text": "world"},
    ]
    srv = LiveCaptionServer(video_path, lambda: iter(segs), port=0)
    srv.start_background()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "EventSource" in page and "/video" in page

        # ranged video fetch (what <video> issues)
        req = urllib.request.Request(f"{base}/video", headers={"Range": "bytes=0-99"})
        resp = urllib.request.urlopen(req)
        assert resp.status == 206
        assert len(resp.read()) == 100

        events = urllib.request.urlopen(f"{base}/events")
        got = []
        for raw in events:
            line = raw.decode().strip()
            if line.startswith("data:"):
                got.append(json.loads(line[5:]))
            if len(got) == 3:
                break
        assert got[:2] == segs and got[2] == {}  # done event payload
    finally:
        srv.shutdown()


def test_stream_segments_live_model(video_path):
    params_ = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    stream = StreamConfig(
        fps=2.0, chunk_duration=1.0, window_size=2, text_round=2,
        text_sink=4, text_sliding_window=4, max_tokens_per_chunk=4,
        kv_capacity=2048, prefill_buckets=(128, 256),
    )
    out = list(
        stream_segments(
            cfg=CFG, params=params_, tokenizer=FakeTokenizer(CFG.tokens),
            video_path=video_path, stream=stream,
            sampling=SamplingConfig(do_sample=False),
            video=VideoConfig(fps=2.0, video_min_pixels=28 * 28,
                              video_max_pixels=16 * 28 * 28),
            duration=4.0, dtype=jnp.float32,
        )
    )
    assert len(out) == 4
    assert all(s["end"] == s["start"] + 1.0 for s in out)
    assert all(isinstance(s["text"], str) for s in out)


def test_render_caption_video(video_path, tmp_path):
    segs = [
        {"start": 0.0, "end": 2.0, "text": "first caption bubble"},
        {"start": 3.0, "end": 5.0, "text": "second one, long enough to wrap "
                                           "across multiple lines of text"},
    ]
    out = str(tmp_path / "rendered.mp4")
    n, drawn = render_caption_video(video_path, segs, out, max_seconds=5.0)
    assert n > 20 and drawn == 2
    r = ingest.VideoReader(out)
    assert r.n_frames >= n - 1  # EOF not-coded-frame clamp
    # bubble visibly changes the frame vs the raw source
    raw = ingest.VideoReader(video_path).fetch([5], r.width, r.height)[0]
    burned = r.fetch([5], r.width, r.height)[0]
    assert np.abs(burned.astype(int) - raw.astype(int)).mean() > 1.0


def test_draw_bubble_pure():
    frame = np.zeros((56, 84, 3), np.uint8)
    out = draw_bubble(frame, "hi there")
    assert out.shape == frame.shape and out.sum() > 0


def test_tts_gated():
    from streaming_vlm_tpu.demo.render import synth_speech

    with pytest.raises(RuntimeError, match="kokoro"):
        synth_speech("hello", "/tmp/x.wav")

def test_render_caption_video_with_tts_mux(video_path, tmp_path):
    """Fake synthesiser -> the native encoder muxes an AAC audio track at
    each segment's start time (reference overlays kokoro audio,
    baselines/livecc/demo/render/video.py:213)."""
    rate = 24000

    def fake_synth(text):
        # 0.5 s tone whose frequency depends on the text
        t = np.arange(int(0.5 * rate)) / rate
        return (0.3 * np.sin(2 * np.pi * (220 + 10 * len(text)) * t)).astype(
            np.float32
        )

    segs = [
        {"start": 0.0, "end": 2.0, "text": "hello stream"},
        {"start": 2.5, "end": 4.0, "text": "second caption"},
    ]
    out = str(tmp_path / "tts.mp4")
    n, drawn = render_caption_video(
        video_path, segs, out, max_seconds=4.0, synth=fake_synth, audio_rate=rate
    )
    assert drawn == 2
    # the container really has an audio track at the requested rate...
    assert ingest.audio_rate(out) == rate
    # ...and the video stream is still intact
    assert ingest.VideoReader(out).n_frames >= n - 1
    # a no-synth render stays video-only
    out2 = str(tmp_path / "plain.mp4")
    render_caption_video(video_path, segs, out2, max_seconds=2.0)
    assert ingest.audio_rate(out2) == 0


def test_video_range_suffix_and_416(video_path):
    """RFC 7233 corners the <video> element actually hits: the SUFFIX form
    bytes=-N (players probe the trailing moov atom with it) must return the
    LAST N bytes, and an out-of-range start must get 416, not a negative
    Content-Length."""
    import os
    import urllib.error

    size = os.path.getsize(video_path)
    with open(video_path, "rb") as f:
        blob = f.read()
    srv = LiveCaptionServer(video_path, lambda: iter([]), port=0)
    srv.start_background()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        req = urllib.request.Request(
            f"{base}/video", headers={"Range": "bytes=-500"}
        )
        resp = urllib.request.urlopen(req)
        assert resp.status == 206
        assert resp.headers["Content-Range"] == f"bytes {size-500}-{size-1}/{size}"
        assert resp.read() == blob[-500:]

        # open-ended range from a mid offset
        req = urllib.request.Request(
            f"{base}/video", headers={"Range": f"bytes={size-10}-"}
        )
        resp = urllib.request.urlopen(req)
        assert resp.status == 206 and resp.read() == blob[-10:]

        # start beyond EOF: 416 with the total size, not garbage
        req = urllib.request.Request(
            f"{base}/video", headers={"Range": f"bytes={size + 5}-"}
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 416
        assert ei.value.headers["Content-Range"] == f"bytes */{size}"
    finally:
        srv.shutdown()
