"""Localize the batched round-0 spike (bench --streams 8 measured round 0 at
2.9x p50 after the single-stream chunk-0 fix). Mirrors bench.run_multistream
with per-phase host timers.

PYTHONPATH=. python tools/profile_round0.py --streams 4
"""

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_3b
    from streaming_vlm_tpu.models.qwen25_vl import vision
    from streaming_vlm_tpu.ops.quant import random_quantized_model_params
    from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine
    from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

    cfg = qwen25_vl_3b()
    tok = cfg.tokens
    B = args.streams
    fps, chunk_duration, window_size = 2.0, 1.0, 16
    grid = (1, 32, 64)
    n_vid_tokens = int(np.prod(grid)) // cfg.vision.spatial_merge_unit

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
    params = random_quantized_model_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(jax.block_until_ready, params)
    ms = MultiStreamEngine(cfg, params, stream, sampling, B, dtype=jnp.bfloat16)

    vcfg = cfg.vision
    frame_h, frame_w = grid[1] * vcfg.patch_size, grid[2] * vcfg.patch_size
    n_frames = grid[0] * vcfg.temporal_patch_size

    @jax.jit
    def synth_patches(key):
        frames = jax.random.randint(
            key, (B, n_frames, frame_h, frame_w, 3), 0, 255, jnp.uint8
        )
        return jax.vmap(
            lambda f: vision.patchify_on_device(vcfg, f, out_dtype=jnp.bfloat16)
        )(frames)

    t0 = time.perf_counter()
    n_exec = ms.prewarm(grids=(grid,))
    print(f"[prewarm {n_exec} in {time.perf_counter()-t0:.1f}s]", flush=True)

    # bisect round-0 dispatch: time the per-lane host preps vs the batched
    # step call vs everything else inside process_round_async
    from streaming_vlm_tpu.streaming import engine as eng_mod
    from streaming_vlm_tpu.streaming import multistream as ms_mod
    from streaming_vlm_tpu.streaming.engine import StreamingEngine

    phase = {"prep": 0.0, "step": 0.0}
    orig_prep = StreamingEngine._prepare_chunk
    orig_step = ms_mod.chunk_step_batched

    def timed_prep(self, *a, **k):
        t0 = time.perf_counter()
        r = orig_prep(self, *a, **k)
        phase["prep"] += time.perf_counter() - t0
        return r

    def timed_step(*a, **k):
        t0 = time.perf_counter()
        r = orig_step(*a, **k)
        phase["step"] += time.perf_counter() - t0
        return r

    StreamingEngine._prepare_chunk = timed_prep
    ms_mod.chunk_step_batched = timed_step

    builders = [PromptBuilder(tok, FakeTokenizer(tok)) for _ in range(B)]
    ve = ms.encode_round(synth_patches(jax.random.PRNGKey(1000)), grid)
    jax.block_until_ready(ve)
    for i in range(args.rounds):
        t0c, t1c = i * chunk_duration, (i + 1) * chunk_duration
        segs_all = []
        for b in range(B):
            segs = []
            if i == 0:
                segs.append(builders[b].system_segment())
                segs.extend(builders[b].previous_text_segments("live stream"))
                segs.extend(builders[b].user_turn_segments(
                    0, t0c, t1c, n_vid_tokens, grid, 2.0 / fps,
                    query=f"Commentate {b}"))
            else:
                segs.extend(builders[b].user_turn_segments(
                    i, t0c, t1c, n_vid_tokens, grid, 2.0 / fps))
            segs.extend(builders[b].assistant_open_segments(i))
            segs_all.append(segs)

        phase["prep"] = phase["step"] = 0.0
        ta = time.perf_counter()
        if i == 0:
            import cProfile
            import pstats

            pr = cProfile.Profile()
            pr.enable()
            handles = ms.process_round_async(segs_all, vis_embeds=ve, grid_thw=grid)
            pr.disable()
            pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
        else:
            handles = ms.process_round_async(segs_all, vis_embeds=ve, grid_thw=grid)
        tb = time.perf_counter()
        if i + 1 < args.rounds:
            ve = ms.encode_round(synth_patches(jax.random.PRNGKey(1001 + i)), grid)
        tc = time.perf_counter()
        outs = ms.finish_round(handles)
        td = time.perf_counter()
        ms.commit_assistant([g for g, _ in outs], 2, i)
        te = time.perf_counter()
        print(
            f"[round {i:02d}] total {1e3*(td-ta):7.1f}  dispatch {1e3*(tb-ta):6.1f}  "
            f"(preps {1e3*phase['prep']:6.1f} step {1e3*phase['step']:6.1f})  "
            f"enc {1e3*(tc-tb):6.1f}  wait {1e3*(td-tc):6.1f}  "
            f"commit {1e3*(te-td):6.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
