"""Isolate the round-0 stall in the B=12 multistream bench (2026-08-20).

Symptom: bench.py round 0 takes 28-253 s (drifting) entirely inside
finish_round's device wait, while prewarm, rounds 1+, and the host path are
all healthy. JAX_LOG_COMPILES shows ZERO compiles in the window, so it is
execution/transport — this script blocks on each first execution separately
to find which executable the tunnel is stalling on (the fault playbook says
the intermittent tunnel fault pins itself to one executable for hours).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_round0_b12.py
"""

import sys
import time

import numpy as np


def mark(tag, t0):
    dt = time.perf_counter() - t0
    print(f"[{tag}] {dt*1000:9.1f} ms", file=sys.stderr, flush=True)
    return time.perf_counter()


def true_sync(x):
    """block_until_ready is UNRELIABLE over the axon tunnel (returns before
    the remote queue drains — CLAUDE.md); a small host transfer is the only
    real barrier. Fetch one element of the first leaf."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])
    return x


def main():
    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import (
        SamplingConfig,
        StreamConfig,
        qwen25_vl_3b,
    )
    from streaming_vlm_tpu.models.qwen25_vl import model, vision
    from streaming_vlm_tpu.ops.quant import random_quantized_model_params
    from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine
    from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    cfg = qwen25_vl_3b()
    tok = cfg.tokens
    fps, chunk_duration, window_size = 2.0, 1.0, 16
    grid = (1, 32, 64)
    n_vid_tokens = int(np.prod(grid)) // cfg.vision.spatial_merge_unit
    stream = StreamConfig(
        fps=fps, chunk_duration=chunk_duration, window_size=window_size,
        text_round=16, text_sink=512, text_sliding_window=512,
        max_tokens_per_chunk=20, kv_capacity=10240,
        prefill_buckets=(640, 1024), kv_quant="int8",
    )
    sampling = SamplingConfig(
        temperature=0.9, repetition_penalty=1.05, do_sample=True
    )
    t0 = time.perf_counter()
    params = random_quantized_model_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree.map(jax.block_until_ready, params)
    t0 = mark("params block_until_ready", t0)
    true_sync(params)
    t0 = mark("params true_sync", t0)

    ms = MultiStreamEngine(
        cfg, params, stream, sampling, B, dtype=jnp.bfloat16
    )
    n = ms.prewarm(grids=(grid,))
    t0 = mark(f"prewarm({n} step variants)", t0)
    true_sync(ms.k_arena)
    t0 = mark("prewarm true_sync", t0)

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

    pat = synth_patches(jax.random.PRNGKey(1000))
    t0 = mark("synth_patches dispatch+compile", t0)
    pat = jax.block_until_ready(pat)
    t0 = mark("synth_patches exec", t0)
    true_sync(pat)
    t0 = mark("synth_patches true_sync", t0)

    ve = ms.encode_round(pat, grid)
    t0 = mark("encode_round dispatch", t0)
    ve = jax.block_until_ready(ve)
    t0 = mark("encode_round exec (12 towers + stack)", t0)
    true_sync(ve)
    t0 = mark("encode_round true_sync", t0)

    builders = [PromptBuilder(tok, FakeTokenizer(tok)) for _ in range(B)]
    segs_all = []
    for b in range(B):
        segs = [builders[b].system_segment()]
        segs.extend(builders[b].previous_text_segments("live stream"))
        segs.extend(
            builders[b].user_turn_segments(
                0, 0.0, 1.0, n_vid_tokens, grid, 2.0 / fps,
                query=f"Commentate on match feed {b}",
            )
        )
        segs.extend(builders[b].assistant_open_segments(0))
        segs_all.append(segs)

    handles = ms.process_round_async(segs_all, vis_embeds=ve, grid_thw=grid)
    t0 = mark("round0 dispatch", t0)
    jax.block_until_ready(ms._gen_all)
    t0 = mark("round0 step exec", t0)
    true_sync(ms._gen_all)
    t0 = mark("round0 true_sync", t0)
    outs = ms.finish_round(handles)
    t0 = mark("round0 finish (gen fetch)", t0)
    ms.commit_assistant([g for g, _ in outs], 2, 0)

    # round 1, phased identically, for contrast
    ve = ms.encode_round(
        synth_patches(jax.random.PRNGKey(1001)), grid
    )
    ve = jax.block_until_ready(ve)
    t0 = mark("round1 encode exec", t0)
    segs_all = [
        list(builders[b].user_turn_segments(
            1, 1.0, 2.0, n_vid_tokens, grid, 2.0 / fps
        )) + builders[b].assistant_open_segments(1)
        for b in range(B)
    ]
    handles = ms.process_round_async(segs_all, vis_embeds=ve, grid_thw=grid)
    jax.block_until_ready(ms._gen_all)
    t0 = mark("round1 step exec", t0)
    ms.finish_round(handles)


if __name__ == "__main__":
    main()
