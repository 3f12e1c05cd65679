"""Localize the chunk-0 latency spike (bench control 2026-08-19 measured
chunk0_over_p50 = 2.49 with FULL prewarm — something in the first real chunk
is not covered by executable warm-up).

Mirrors bench.py's pipelined loop exactly, but splits each chunk into
phases with host wall-clock:
  host   = segment append + prompt/descriptor assembly + dispatch
  enc    = synth + upload + encode dispatch of chunk i+1
  wait   = finish_chunk (gen fetch)
  commit = commit_assistant (+ evict dispatch)

PYTHONPATH=. python tools/profile_chunk0.py
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_3b
    from streaming_vlm_tpu.models.qwen25_vl import model
    from streaming_vlm_tpu.streaming.engine import StreamingEngine
    from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

    cfg = qwen25_vl_3b()
    tok = cfg.tokens
    fps, chunk_duration, window_size = 2.0, 1.0, 16
    grid = (1, 32, 64)
    n_vid_tokens = int(np.prod(grid)) // cfg.vision.spatial_merge_unit

    from streaming_vlm_tpu.ops.quant import random_quantized_model_params

    params = random_quantized_model_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(jax.block_until_ready, params)
    print("[params ready]", file=sys.stderr, flush=True)

    stream = StreamConfig(
        fps=fps, chunk_duration=chunk_duration, window_size=window_size,
        text_round=16, text_sink=512, text_sliding_window=512,
        max_tokens_per_chunk=20, kv_capacity=10240,
        prefill_buckets=tuple(
            int(b)
            for b in os.environ.get("SVT_BENCH_BUCKETS", "640,1024").split(",")
        ),
        kv_quant=os.environ.get("SVT_KV_QUANT", "int8"),
    )
    sampling = SamplingConfig(temperature=0.9, repetition_penalty=1.05, do_sample=True)
    engine = StreamingEngine(cfg, params, stream, sampling, dtype=jnp.bfloat16)
    builder = PromptBuilder(tok, FakeTokenizer(tok))
    rng = np.random.default_rng(0)

    frame_h = grid[1] * cfg.vision.patch_size
    frame_w = grid[2] * cfg.vision.patch_size
    n_frames = grid[0] * cfg.vision.temporal_patch_size

    def synth_frames(i):
        return rng.integers(0, 255, size=(n_frames, frame_h, frame_w, 3), dtype=np.uint8)

    def encode_chunk(i):
        return model.encode_video_frames(
            cfg, params, engine.upload_frames(synth_frames(i)), grid,
            dtype=jnp.bfloat16,
        )

    vis_embeds = encode_chunk(0)
    jax.block_until_ready(vis_embeds)
    t0 = time.perf_counter()
    n_exec = engine.prewarm(grids=(grid,), vision="none")
    print(f"[prewarm {n_exec} exes in {time.perf_counter()-t0:.1f}s]",
          file=sys.stderr, flush=True)

    # --- fine-grained: split host phase into prepare vs dispatch, and watch
    # the jit cache size to catch a chunk-0 executable cache miss
    from streaming_vlm_tpu.streaming import engine as eng_mod

    orig_prep = StreamingEngine._prepare_chunk
    orig_step = eng_mod.chunk_step
    phase = {}

    def timed_prep(self, *a, **k):
        t0 = time.perf_counter()
        r = orig_prep(self, *a, **k)
        phase["prep"] = time.perf_counter() - t0
        return r

    def timed_step(*a, **k):
        t0 = time.perf_counter()
        r = orig_step(*a, **k)
        phase["step"] = time.perf_counter() - t0
        return r

    StreamingEngine._prepare_chunk = timed_prep
    eng_mod.chunk_step = timed_step
    print(f"[after prewarm] chunk_step cache size = {orig_step._cache_size()}",
          flush=True)

    n_chunks = 24
    for i in range(n_chunks):
        t0c, t1c = i * chunk_duration, (i + 1) * chunk_duration
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments("live stream"))
            segs.extend(builder.user_turn_segments(
                0, t0c, t1c, n_vid_tokens, grid, 2.0 / fps,
                query="Commentate on this match"))
        else:
            segs.extend(builder.user_turn_segments(
                i, t0c, t1c, n_vid_tokens, grid, 2.0 / fps))
        segs.extend(builder.assistant_open_segments(i))

        from streaming_vlm_tpu.utils.profiling import SectionTimer

        tmr = SectionTimer() if i < 3 else None
        ta = time.perf_counter()
        handle = engine.process_chunk_async(
            segs, vis_embeds=vis_embeds, grid_thw=grid, timer=tmr
        )
        tb = time.perf_counter()
        if i + 1 < n_chunks:
            vis_embeds = encode_chunk(i + 1)
        tc = time.perf_counter()
        gen, _ = engine.finish_chunk(handle)
        td = time.perf_counter()
        engine.commit_assistant(gen, 2, i)
        te = time.perf_counter()
        print(
            f"[chunk {i:02d}] total {1e3*(td-ta):7.1f}  host {1e3*(tb-ta):6.1f}  "
            f"(prep {1e3*phase.get('prep',0):6.1f} step {1e3*phase.get('step',0):6.1f})  "
            f"enc {1e3*(tc-tb):6.1f}  wait {1e3*(td-tc):6.1f}  "
            f"commit {1e3*(te-td):6.1f}  cache={orig_step._cache_size()}  gen={len(gen)}",
            flush=True,
        )
        if tmr is not None:
            rec = {k: round(v * 1e3, 1) for k, v in tmr.record().items()}
            print(f"           sections {rec}", flush=True)


if __name__ == "__main__":
    main()
