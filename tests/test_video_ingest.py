"""Native video ingest tests: build the C++ lib, encode a test clip with it,
decode it back, and check sampling/patchify semantics (patchify against the
HF Qwen2VL image processor)."""

import os

import numpy as np
import pytest

from streaming_vlm_tpu.video import ingest


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    ingest.build_native()
    ingest.write_test_video(path, w=128, h=96, n_frames=60, fps=10)
    return path


def test_reader_index(test_video):
    r = ingest.VideoReader(test_video)
    assert r.n_frames == 60
    assert (r.width, r.height) == (128, 96)
    assert abs(r.avg_fps - 10.0) < 0.5
    ts = r.frame_ts
    assert ts.shape == (60, 2)
    # monotonically increasing end timestamps, ~0.1 s apart
    d = np.diff(ts[:, 1])
    assert np.all(d > 0) and abs(float(np.median(d)) - 0.1) < 0.02


def test_fetch_and_seek(test_video):
    r = ingest.VideoReader(test_video)
    frames = r.fetch([0, 1, 2], 64, 48)
    assert frames.shape == (3, 48, 64, 3)
    # frames differ over time (moving gradient)
    assert np.abs(frames[0].astype(int) - frames[2].astype(int)).mean() > 1
    # backwards seek works
    back = r.fetch([1], 64, 48)
    np.testing.assert_array_equal(back[0], frames[1])
    # far-forward seek works
    far = r.fetch([55], 64, 48)
    assert far.shape == (1, 48, 64, 3)


def test_strict_fps_selection(test_video):
    r = ingest.VideoReader(test_video)
    # chunk [2.0, 3.0) at 2 FPS -> 2 frames
    idxs, pts = ingest.select_chunk_frames(
        r.frame_ts[:, 1], 2.0, 3.0, fps=2.0, frame_factor=2, only_last=2
    )
    assert len(idxs) == 2
    assert all(2.0 <= p <= 3.05 for p in pts)
    # frame_factor padding: a single expected timestamp pads by repetition
    idxs2, _ = ingest.select_chunk_frames(
        r.frame_ts[:, 1], 2.0, 2.3, fps=2.0, frame_factor=2
    )
    assert len(idxs2) % 2 == 0


def test_smart_resize():
    # within budget: rounds to factor multiples
    assert ingest.smart_resize(96, 128, factor=28, min_pixels=28 * 28, max_pixels=10**7) == (84, 140)
    # over budget: scales down
    h, w = ingest.smart_resize(1080, 1920, factor=28, max_pixels=512 * 28 * 28)
    assert h * w <= 512 * 28 * 28 and h % 28 == 0 and w % 28 == 0


def test_patchify_matches_hf(test_video):
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    r = ingest.VideoReader(test_video)
    frames = r.fetch([0, 1], 112, 84)  # already factor-28 multiples

    proc = Qwen2VLImageProcessor(
        do_resize=False, do_rescale=True, do_normalize=True,
        min_pixels=1, max_pixels=10**9,
    )
    hf = proc(images=None, videos=[list(frames)], return_tensors="np")
    hf_patches = hf["pixel_values_videos"]
    hf_grid = tuple(int(x) for x in hf["video_grid_thw"][0])

    ours, grid = ingest.patchify_frames(frames)
    assert grid == hf_grid
    np.testing.assert_allclose(ours, hf_patches, atol=1e-5)


def test_chunked_source(test_video):
    src = ingest.ChunkedVideoSource(
        test_video, fps=2.0, max_pixels=512 * 28 * 28, min_pixels=28 * 28
    )
    assert src.duration > 5.0
    patches, grid, pts = src.read_chunk(1.0, 2.0)
    t, gh, gw = grid
    assert t == 1  # 2 frames -> 1 temporal grid
    assert patches.shape == (t * gh * gw, 3 * 2 * 14 * 14)
    assert all(1.0 <= p <= 2.05 for p in pts)
