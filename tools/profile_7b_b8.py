"""Where does the 7B B=8 round spend its 1053 ms? (VERDICT r3 next #4:
realtime needs <= 1000 ms.)

Splits the steady batched round into: vision encode (dispatch+wait),
prefill-only step (max_new=1), full step (max_new=20) -> decode cost per
token, eviction, host dispatch. Run variants with SVT_PREROTATE=0 /
SVT_KV_QUANT / SVT_BENCH_BUCKETS to A/B levers.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_7b_b8.py [B]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_7b
from streaming_vlm_tpu.models.qwen25_vl import vision
from streaming_vlm_tpu.ops.quant import random_quantized_model_params
from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
MAXN = 20
cfg = qwen25_vl_7b()
tok = cfg.tokens
grid = (1, 32, 64)
n_vid = int(np.prod(grid)) // cfg.vision.spatial_merge_unit
stream = StreamConfig(
    fps=2.0, chunk_duration=1.0, window_size=16, text_round=16,
    text_sink=512, text_sliding_window=512, max_tokens_per_chunk=MAXN,
    kv_capacity=10240,
    prefill_buckets=tuple(
        int(b) for b in os.environ.get("SVT_BENCH_BUCKETS", "640,1024").split(",")
    ),
    prerotate_arena=(False if os.environ.get("SVT_PREROTATE") == "0" else None),
    kv_quant=os.environ.get("SVT_KV_QUANT", "int8"),
)
sampling = SamplingConfig(temperature=0.9, repetition_penalty=1.05, do_sample=True)
params = random_quantized_model_params(cfg, jax.random.PRNGKey(0))
params = jax.tree.map(jax.block_until_ready, params)
print("[params ready]", flush=True)
ms = MultiStreamEngine(cfg, params, stream, sampling, B, dtype=jnp.bfloat16)
vcfg = cfg.vision
fh, fw = grid[1] * vcfg.patch_size, grid[2] * vcfg.patch_size
nf = grid[0] * vcfg.temporal_patch_size


@jax.jit
def synth_patches(key):
    frames = jax.random.randint(key, (B, nf, fh, fw, 3), 0, 255, jnp.uint8)
    return jax.vmap(
        lambda f: vision.patchify_on_device(vcfg, f, out_dtype=jnp.bfloat16)
    )(frames)


t0 = time.perf_counter()
n = ms.prewarm(grids=(grid,))
print(f"[prewarm] {n} executables in {time.perf_counter()-t0:.1f} s", flush=True)

builders = [PromptBuilder(tok, FakeTokenizer(tok)) for _ in range(B)]
end_bias = builders[0].measure_biases()[1]


def make_segs(i):
    segs_all = []
    for b in range(B):
        segs = []
        if i == 0:
            segs.append(builders[b].system_segment())
            segs.extend(builders[b].previous_text_segments("live"))
            segs.extend(
                builders[b].user_turn_segments(0, 0.0, 1.0, n_vid, grid, 1.0, query=f"q{b}")
            )
        else:
            segs.extend(
                builders[b].user_turn_segments(i, i * 1.0, (i + 1) * 1.0, n_vid, grid, 1.0)
            )
        segs.extend(builders[b].assistant_open_segments(i))
        segs_all.append(segs)
    return segs_all


rows = []
ve = ms.encode_round(synth_patches(jax.random.PRNGKey(1000)), grid)
jax.block_until_ready(ve)
N_ROUNDS = 30
for i in range(N_ROUNDS):
    segs_all = make_segs(i)
    # steady rounds 22+: alternate full budget and max_new=1 to split
    # prefill-vs-decode (a max_new=1 lane still prefills + samples once)
    probe_prefill = i >= 22 and i % 2 == 1
    budgets = [1] * B if probe_prefill else None

    t_enc0 = time.perf_counter()
    pat = synth_patches(jax.random.PRNGKey(100 + i))
    ve = ms.encode_round(pat, grid)
    jax.block_until_ready(ve)
    t_enc = time.perf_counter() - t_enc0

    t1 = time.perf_counter()
    handles = ms.process_round_async(segs_all, vis_embeds=ve, grid_thw=grid, max_new=budgets)
    t_disp = time.perf_counter() - t1
    t2 = time.perf_counter()
    outs = ms.finish_round(handles)
    t_fin = time.perf_counter() - t2
    ms.commit_assistant([g for g, _ in outs], end_bias, i)
    total = t_disp + t_fin
    rows.append((i, probe_prefill, t_enc, t_disp, t_fin, total))
    print(
        f"[{i:02d}]{' P' if probe_prefill else '  '} enc {t_enc*1e3:7.1f} "
        f"disp {t_disp*1e3:6.1f} fin {t_fin*1e3:7.1f} step {total*1e3:7.1f} "
        f"kv={ms.engines[0].cached}",
        flush=True,
    )

full = [r[5] for r in rows if r[0] >= 22 and not r[1]]
pref = [r[5] for r in rows if r[0] >= 22 and r[1]]
enc = [r[2] for r in rows if r[0] >= 22]
if full and pref:
    f50, p50 = float(np.median(full)), float(np.median(pref))
    print(
        f"\nsteady: full(max_new={MAXN}) {f50*1e3:.1f} ms | prefill-only "
        f"{p50*1e3:.1f} ms | decode {(f50-p50)*1e3:.1f} ms "
        f"= {(f50-p50)/(MAXN-1)*1e3:.2f} ms/tok | encode {np.median(enc)*1e3:.1f} ms",
        flush=True,
    )
