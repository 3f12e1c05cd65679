"""jax.profiler trace capture (utils/profiling.trace): the deep-tracing
layer the reference lacks (its only instrumentation is wall-clock sections,
reference inference.py:312-329). Asserts a TensorBoard XPlane dump is really
produced, both standalone and through streaming_inference(trace_dir=...)."""

import glob
import os

import jax
import jax.numpy as jnp

from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, VideoConfig, qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer
from streaming_vlm_tpu.utils.profiling import trace
from streaming_vlm_tpu.video import ingest


def xplanes(d):
    return glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)


def test_trace_context_writes_xplane(tmp_path):
    d = str(tmp_path / "tr")
    with trace(d):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    assert xplanes(d), f"no xplane dump under {d}"


def test_streaming_inference_trace_dir(tmp_path):
    from streaming_vlm_tpu.serve import streaming_inference

    cfg = qwen25_vl_tiny()
    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ingest.build_native()
    clip = str(tmp_path / "clip.mp4")
    ingest.write_test_video(clip, w=56, h=56, n_frames=30, fps=10)
    d = str(tmp_path / "tr2")
    responses = streaming_inference(
        cfg=cfg, params=params, tokenizer=FakeTokenizer(cfg.tokens),
        video_path=clip,
        stream=StreamConfig(
            fps=2.0, chunk_duration=1.0, window_size=2, text_round=2,
            text_sink=4, text_sliding_window=4, max_tokens_per_chunk=4,
            kv_capacity=1024, prefill_buckets=(128, 256),
        ),
        sampling=SamplingConfig(do_sample=False),
        video=VideoConfig(fps=2.0, video_min_pixels=28 * 28,
                          video_max_pixels=16 * 28 * 28),
        duration=2.0, quiet=True, trace_dir=d, dtype=jnp.float32,
    )
    assert len(responses) == 2
    assert xplanes(d), f"no xplane dump under {d}"
