"""Multi-client HTTP serving demo: N videos -> N concurrent SSE caption
streams batched on one chip (demo/multiapp.py over streaming/multiserve.py).

The reference's demo binds one process to one GPU for one stream
(baselines/livecc/demo/app.py); this tier has no reference counterpart, so
the acceptance bar is internal consistency: the HTTP path must produce
exactly what a solo single-stream session produces (greedy), across lanes
with DIFFERENT video resolutions in the same batched rounds."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from streaming_vlm_tpu.config import (
    SamplingConfig,
    StreamConfig,
    VideoConfig,
    qwen25_vl_tiny,
)
from streaming_vlm_tpu.demo.app import stream_segments
from streaming_vlm_tpu.demo.multiapp import MultiLiveCaptionServer
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer
from streaming_vlm_tpu.video import ingest

CFG = qwen25_vl_tiny()
DURATION = 4.0


def small_stream():
    return StreamConfig(
        fps=2.0, chunk_duration=1.0, window_size=2, text_round=2,
        text_sink=4, text_sliding_window=4, max_tokens_per_chunk=4,
        kv_capacity=2048, prefill_buckets=(128, 256),
    )


def small_video():
    return VideoConfig(
        fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28
    )


@pytest.fixture(scope="module")
def video_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("multiapp")
    ingest.build_native()
    # DIFFERENT resolutions: the two lanes carry different grids in the same
    # batched rounds (multiserve mixed-grid path)
    a = str(d / "a.mp4")
    b = str(d / "b.mp4")
    ingest.write_test_video(a, w=84, h=56, n_frames=60, fps=10)
    ingest.write_test_video(b, w=56, h=56, n_frames=60, fps=10)
    return [a, b]


@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def sse_read(base, i, timeout=300.0):
    got = []
    with urllib.request.urlopen(f"{base}/events/{i}", timeout=timeout) as events:
        for raw in events:
            line = raw.decode().strip()
            if line == "event: done":
                break
            if line.startswith("data:"):
                got.append(json.loads(line[5:]))
    return got


def test_multiapp_end_to_end_matches_solo(video_paths, params):
    tok = FakeTokenizer(CFG.tokens)
    srv = MultiLiveCaptionServer(
        CFG, params, tok, video_paths,
        stream=small_stream(),
        sampling=SamplingConfig(do_sample=False),
        video=small_video(),
        duration=DURATION, port=0, dtype=jnp.float32,
    )
    srv.start_background()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        # dashboard + per-stream player pages are served
        page = urllib.request.urlopen(f"{base}/", timeout=30).read().decode()
        assert "const N = 2" in page
        player = urllib.request.urlopen(f"{base}/stream/1", timeout=30).read().decode()
        assert "/video/1" in player and "/events/1" in player

        # ranged video fetch (what the <video> tag issues)
        req = urllib.request.Request(
            f"{base}/video/1", headers={"Range": "bytes=0-99"}
        )
        resp = urllib.request.urlopen(req, timeout=30)
        assert resp.status == 206 and len(resp.read()) == 100

        assert urllib.request.urlopen(f"{base}/video/7", timeout=30).status == 404
    except urllib.error.HTTPError as e:
        assert e.code == 404  # the /video/7 probe
    got = [sse_read(base, i) for i in range(2)]
    assert srv.wait(timeout=600.0)
    try:
        n_chunks = int(DURATION)  # 1 s chunks
        for segs in got:
            assert len(segs) == n_chunks
            assert [s["start"] for s in segs] == [float(c) for c in range(n_chunks)]
            assert all(isinstance(s["text"], str) for s in segs)

        # lane 0 through the batched HTTP server == a solo single-stream
        # session on the same video (greedy): serving N clients changes
        # nothing about any one client's stream
        solo = list(
            stream_segments(
                cfg=CFG, params=params, tokenizer=tok,
                video_path=video_paths[0], stream=small_stream(),
                sampling=SamplingConfig(do_sample=False),
                video=small_video(), duration=DURATION, dtype=jnp.float32,
            )
        )
        assert [s["text"] for s in got[0]] == [s["text"] for s in solo]
    finally:
        srv.shutdown()
