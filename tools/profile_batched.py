"""Per-piece timing of chunk_step_batched vs B (vmap scaling forensics).

Separates prefill from decode by differencing max_new=1 vs max_new=20
(decode/token = (t20 - t1) / 19). Run on the TPU tunnel:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_batched.py 1 2 4
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_3b
from streaming_vlm_tpu.ops.quant import random_quantized_model_params
from streaming_vlm_tpu.streaming.engine import ChunkStatics, chunk_step_batched
from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine

Bs = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
cfg = qwen25_vl_3b()
params = random_quantized_model_params(cfg, jax.random.PRNGKey(0))
params = jax.tree.map(jax.block_until_ready, params)
print("[params ready]", flush=True)

stream = StreamConfig(
    fps=2.0, chunk_duration=1.0, window_size=16, text_round=16,
    text_sink=512, text_sliding_window=512, max_tokens_per_chunk=20,
    kv_capacity=10240, prefill_buckets=(640,),
)
sampling = SamplingConfig(temperature=0.9, repetition_penalty=1.05, do_sample=True)
T_PAD = 640

for B in Bs:
    ms = MultiStreamEngine(cfg, params, stream, sampling, B, dtype=jnp.bfloat16)
    desc, _, _, _ = ms.engines[0].table.position_descriptors(
        spatial_merge_size=cfg.vision.spatial_merge_size,
        tokens_per_second=cfg.vision.tokens_per_second, extra_text=1,
    )
    slot_pos = {k: jnp.stack([jnp.asarray(v)] * B) for k, v in desc.items()}
    tokens = jnp.full((B, T_PAD), cfg.tokens.pad, jnp.int32)
    zero = jnp.zeros((B,), jnp.int32)
    eos = jnp.full((B,), cfg.tokens.im_end, jnp.int32)
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    res = {}
    for max_new in (1, 20):
        statics = ChunkStatics(
            cfg=cfg, t_pad=T_PAD, max_new=max_new,
            temperature=0.9, repetition_penalty=1.05, do_sample=True,
            eos_threshold=None, use_descriptors=True, prerotate=True,
        )
        k, v, ids = ms.k_arena, ms.v_arena, ms.ids_arena
        ts = []
        for it in range(6):
            t0 = time.perf_counter()
            k, v, ids, g, n, r = chunk_step_batched(
                statics, params, k, v, slot_pos, tokens, None, None,
                ids, zero, zero, eos,
                jnp.full((B,), max_new, jnp.int32), rngs,
            )
            np.asarray(g[0, 0])  # force a real host transfer (sync)
            ts.append(time.perf_counter() - t0)
        ms.k_arena, ms.v_arena, ms.ids_arena = k, v, ids
        res[max_new] = float(np.median(ts[1:]))
        print(f"B={B} max_new={max_new}: median {res[max_new]*1000:8.1f} ms "
              f"(first {ts[0]*1000:.0f})", flush=True)
    dec = (res[20] - res[1]) / 19.0
    print(f"B={B}: prefill+1tok {res[1]*1000:8.1f} ms   decode {dec*1000:6.2f} ms/tok",
          flush=True)
    del ms
