"""Host/device split of the steady-state chunk using the engine's own
SectionTimer (PKV/INPUT/GEN) + direct single-dispatch device timings.

PYTHONPATH=. python tools/profile_sections.py
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_3b
    from streaming_vlm_tpu.models.qwen25_vl import model
    from streaming_vlm_tpu.streaming.engine import StreamingEngine
    from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder
    from streaming_vlm_tpu.utils.profiling import SectionTimer

    cfg = qwen25_vl_3b()
    tok = cfg.tokens
    fps, chunk_duration, window_size = 2.0, 1.0, 16
    grid = (1, 32, 64)
    n_vid_tokens = int(np.prod(grid)) // cfg.vision.spatial_merge_unit

    # dispatch latency: tiny op round trip
    tiny = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(tiny))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(tiny))
        ts.append(time.perf_counter() - t0)
    print(f"tiny-op round trip: {min(ts)*1e3:.2f} ms (min of 10)")

    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if os.environ.get("SVT_QUANT", "int8") == "int8":
        from streaming_vlm_tpu.ops.quant import quantize_model_params

        params = quantize_model_params(params, donate=True)
    params = jax.tree.map(jax.block_until_ready, params)

    stream = StreamConfig(
        fps=fps, chunk_duration=chunk_duration, window_size=window_size,
        text_round=16, text_sink=512, text_sliding_window=512,
        max_tokens_per_chunk=20, kv_capacity=10240, prefill_buckets=(640, 1024),
    )
    sampling = SamplingConfig(temperature=0.9, repetition_penalty=1.05, do_sample=True)
    engine = StreamingEngine(cfg, params, stream, sampling, dtype=jnp.bfloat16)
    engine.prewarm()
    builder = PromptBuilder(tok, FakeTokenizer(tok))
    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 255,
        size=(grid[0] * cfg.vision.temporal_patch_size,
              grid[1] * cfg.vision.patch_size, grid[2] * cfg.vision.patch_size, 3),
        dtype=np.uint8,
    )
    vis_embeds = model.encode_video_frames(
        cfg, params, engine.upload_frames(frames), grid, dtype=jnp.bfloat16
    )
    recs = []
    for i in range(24):
        t0c, t1c = i * chunk_duration, (i + 1) * chunk_duration
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments("live stream"))
            segs.extend(builder.user_turn_segments(
                0, t0c, t1c, n_vid_tokens, grid, 2.0 / fps, query="Commentate"))
        else:
            segs.extend(builder.user_turn_segments(i, t0c, t1c, n_vid_tokens, grid, 2.0 / fps))
        segs.extend(builder.assistant_open_segments(i))
        timer = SectionTimer()
        handle = engine.process_chunk_async(segs, vis_embeds=vis_embeds, grid_thw=grid, timer=timer)
        gen, _ = engine.finish_chunk(handle)
        engine.commit_assistant(gen, 2, i)
        recs.append(timer.record())
    steady = recs[window_size + 2 :]
    for k in ("PKV", "INPUT", "GEN", "total"):
        vals = [r[k] * 1e3 for r in steady]
        print(f"{k:6s} median {np.median(vals):7.1f} ms")

    # direct device time of one more chunk_step (dispatch + tiny transfer):
    # time finish-to-finish around a single async dispatch with NO other work
    i = 24
    segs = builder.user_turn_segments(i, i * 1.0, (i + 1) * 1.0, n_vid_tokens, grid, 1.0)
    segs.extend(builder.assistant_open_segments(i))
    t0 = time.perf_counter()
    handle = engine.process_chunk_async(segs, vis_embeds=vis_embeds, grid_thw=grid)
    t1 = time.perf_counter()
    gen, _ = engine.finish_chunk(handle)
    t2 = time.perf_counter()
    print(f"single chunk: dispatch {1e3*(t1-t0):.1f} ms, wait(gen transfer) {1e3*(t2-t1):.1f} ms")


if __name__ == "__main__":
    main()
