"""Decompose the steady-state chunk cost using the REAL engine (trustworthy:
same executables as bench.py, timed over the same protocol).

Ablations (each its own engine; one process per SVT_* env setting):
  * full      : bench protocol incl. pipelined next-chunk vision encode
  * no_encode : vis_embeds reused -> chunk_step + host only
  * prefill   : no_encode with max_new=1 -> prefill-only chunk
  * (decode cost/token = (no_encode - prefill) / 19)

Usage: PYTHONPATH=. python tools/profile_chunk.py [--kv 10240] [--chunks 24]
Env:   SVT_QUANT=none for bf16, SVT_USE_PALLAS_ATTN=0 for the XLA path.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv", type=int, default=10240)
    ap.add_argument("--chunks", type=int, default=24)
    args = ap.parse_args()

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

    import os

    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if os.environ.get("SVT_QUANT", "int8") == "int8":
        from streaming_vlm_tpu.ops.quant import quantize_model_params

        params = quantize_model_params(params, donate=True)
    params = jax.tree.map(jax.block_until_ready, params)

    def run(tag, *, max_new, encode_next, kv):
        stream = StreamConfig(
            fps=fps, chunk_duration=chunk_duration, window_size=window_size,
            text_round=16, text_sink=512, text_sliding_window=512,
            max_tokens_per_chunk=max_new, kv_capacity=kv,
            prefill_buckets=(640, 1024),
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
        times = []
        for i in range(args.chunks):
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
            t_start = time.perf_counter()
            handle = engine.process_chunk_async(segs, vis_embeds=vis_embeds, grid_thw=grid)
            if encode_next:
                vis_embeds = model.encode_video_frames(
                    cfg, params, engine.upload_frames(frames), grid, dtype=jnp.bfloat16
                )
            gen, _ = engine.finish_chunk(handle)
            times.append(time.perf_counter() - t_start)
            engine.commit_assistant(gen, 2, i)
        steady = times[window_size + 2 :]
        med = float(np.median(steady)) * 1e3
        print(f"{tag:34s} {med:8.1f} ms/chunk  (steady n={len(steady)})", flush=True)
        return med

    t_full = run("full (encode pipelined, new=20)", max_new=20, encode_next=True, kv=args.kv)
    t_ne = run("no_encode (new=20)", max_new=20, encode_next=False, kv=args.kv)
    t_pf = run("prefill-only (new=1)", max_new=1, encode_next=False, kv=args.kv)
    t_pf0 = run("prefill-only small kv=2048", max_new=1, encode_next=False, kv=2048)
    print(f"\nencode share       : {t_full - t_ne:7.1f} ms")
    print(f"decode cost/token  : {(t_ne - t_pf) / 19.0:7.2f} ms")
    print(f"prefill total      : {t_pf:7.1f} ms")
    print(f"prefill arena-attn (C 10240 vs 2048 diff): {t_pf - t_pf0:7.1f} ms")


if __name__ == "__main__":
    main()
