"""Decompose PREFILL device time with the real engine (same executables as
bench.py). One ablation per process (chunk_step's jit cache is keyed on
ChunkStatics only — env/monkeypatch changes don't invalidate it).

  --ablate none    : stock prefill (pallas attention on TPU)
  --ablate noattn  : streaming_prefill_attention stubbed with a cheap
                     shape-preserving combine of q/k_self/v_self (keeps the
                     qkv projections + rope live under DCE, removes the
                     attention kernel AND its arena HBM reads)
  SVT_USE_PALLAS_ATTN=0 --ablate none : XLA multi-source-softmax path

Deltas across runs:
  none - noattn                  = attention total (kernel + arena DMA)
  noattn - (embed+scan overhead) ~ matmul share
Usage: PYTHONPATH=. python tools/profile_prefill.py --ablate noattn
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv", type=int, default=10240)
    ap.add_argument("--chunks", type=int, default=24)
    ap.add_argument("--ablate", choices=("none", "noattn"), default="none")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_3b
    from streaming_vlm_tpu.models.qwen25_vl import model
    from streaming_vlm_tpu.streaming.engine import StreamingEngine
    from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

    if args.ablate == "noattn":
        from streaming_vlm_tpu.ops import attention as attn_mod

        def stub(q_rot, k_arena, v_arena, acos2, asin2, k_self_rot, v_self,
                 visible_len, *, t_b=128, c_b=1024, interpret=False):
            T, H, hd = q_rot.shape
            Hkv = k_self_rot.shape[1]
            g = H // Hkv
            ks = jnp.repeat(k_self_rot, g, axis=1)
            vs = jnp.repeat(v_self[:T], g, axis=1)
            return (q_rot + 0.001 * ks + 0.001 * vs).astype(v_self.dtype)

        attn_mod.streaming_prefill_attention = stub

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

    stream = StreamConfig(
        fps=fps, chunk_duration=chunk_duration, window_size=window_size,
        text_round=16, text_sink=512, text_sliding_window=512,
        max_tokens_per_chunk=1, kv_capacity=args.kv,
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
        gen, _ = engine.finish_chunk(handle)
        times.append(time.perf_counter() - t_start)
        engine.commit_assistant(gen, 2, i)
    steady = times[window_size + 2 :]
    med = float(np.median(steady)) * 1e3
    pal = os.environ.get("SVT_USE_PALLAS_ATTN", "1")
    print(
        f"prefill ablate={args.ablate} pallas={pal} quant="
        f"{os.environ.get('SVT_QUANT', 'int8')} kv={args.kv}: "
        f"{med:8.1f} ms/chunk (steady n={len(steady)})",
        flush=True,
    )


if __name__ == "__main__":
    main()
