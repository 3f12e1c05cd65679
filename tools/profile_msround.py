"""Phase-fenced timing of one multistream round (B streams, real protocol).
Reveals where bench.py --streams rounds spend time when chunk_step_batched
alone is fast. PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_msround.py 4"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_3b
from streaming_vlm_tpu.models.qwen25_vl import model, vision
from streaming_vlm_tpu.ops.quant import random_quantized_model_params
from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
cfg = qwen25_vl_3b()
tok = cfg.tokens
params = random_quantized_model_params(cfg, jax.random.PRNGKey(0))
params = jax.tree.map(jax.block_until_ready, params)
print("[params ready]", flush=True)

fps, chunk_duration = 2.0, 1.0
grid = (1, 32, 64)
n_vid = int(np.prod(grid)) // cfg.vision.spatial_merge_unit
stream = StreamConfig(
    fps=fps, chunk_duration=chunk_duration, window_size=16, text_round=16,
    text_sink=512, text_sliding_window=512, max_tokens_per_chunk=20,
    kv_capacity=10240, prefill_buckets=(640, 960),
)
sampling = SamplingConfig(temperature=0.9, repetition_penalty=1.05, do_sample=True)
ms = MultiStreamEngine(cfg, params, stream, sampling, B, dtype=jnp.bfloat16)
vcfg = cfg.vision
fh, fw = grid[1] * vcfg.patch_size, grid[2] * vcfg.patch_size
nf = grid[0] * vcfg.temporal_patch_size

@jax.jit
def synth_patches(key):
    frames = jax.random.randint(key, (B, nf, fh, fw, 3), 0, 255, jnp.uint8)
    return jax.vmap(lambda f: vision.patchify_on_device(vcfg, f, out_dtype=jnp.bfloat16))(frames)

n = ms.prewarm(grids=(grid,))
print(f"[prewarm] {n} variants", flush=True)
builders = [PromptBuilder(tok, FakeTokenizer(tok)) for _ in range(B)]
for i in range(24):
    t0 = time.perf_counter()
    pat = synth_patches(jax.random.PRNGKey(100 + i))
    ve = ms.encode_round(pat, grid)
    jax.block_until_ready(ve)
    t_enc = time.perf_counter() - t0

    segs_all = []
    for b in range(B):
        segs = []
        if i == 0:
            segs.append(builders[b].system_segment())
            segs.extend(builders[b].previous_text_segments("live"))
            segs.extend(builders[b].user_turn_segments(0, 0.0, 1.0, n_vid, grid, 1.0, query=f"q{b}"))
        else:
            segs.extend(builders[b].user_turn_segments(i, i * 1.0, (i + 1) * 1.0, n_vid, grid, 1.0))
        segs.extend(builders[b].assistant_open_segments(i))
        segs_all.append(segs)

    t1 = time.perf_counter()
    plans = [e.evict_plan() for e in ms.engines]
    # undo nothing; emulate step 1 manually to time the gather alone
    changed = any(p.changed for p in plans)
    if changed:
        from streaming_vlm_tpu.streaming.engine import compact_arena_batched
        C = stream.kv_capacity
        src = np.tile(np.arange(C, dtype=np.int32), (B, 1))
        for b, p in enumerate(plans):
            if p.changed:
                src[b, : p.src.shape[0]] = p.src
        ms.k_arena, ms.v_arena, ms.ids_arena = compact_arena_batched(
            ms.k_arena, ms.v_arena, ms.ids_arena, jnp.asarray(src))
        jax.block_until_ready(ms.k_arena)
    t_evict = time.perf_counter() - t1

    t2 = time.perf_counter()
    handles = ms.process_round_async(segs_all, vis_embeds=ve, grid_thw=grid)
    t_disp = time.perf_counter() - t2
    t3 = time.perf_counter()
    outs = ms.finish_round(handles)
    t_fin = time.perf_counter() - t3
    ms.commit_assistant([g for g, _ in outs], 2, i)
    print(f"[{i:02d}] enc {t_enc*1000:7.1f}  evict {t_evict*1000:6.1f}({changed})  "
          f"dispatch {t_disp*1000:7.1f}  finish {t_fin*1000:7.1f}  kv={ms.engines[0].cached}",
          flush=True)
