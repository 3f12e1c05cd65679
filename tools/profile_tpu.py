"""In-graph decomposition of the steady-state chunk cost on the real TPU.

Every measurement scans the op N times INSIDE one jit (dispatch latency over
the axon tunnel is ~2.5 ms and standalone timings are misleading — CLAUDE.md).
Timing fence = materialising a small output slice on the host.

Sections:
  * prefill_attn_pallas / prefill_attn_xla : one layer's chunk-prefill
    attention (T=640 queries over C=10240 arena + self block), x36
  * prefill_dense : one layer's QKV/O/MLP matmuls at T=640 (no attention), x36
  * decode_dense  : one layer's matmuls at T=1, x36 (per-token weight sweep)
  * decode_attn   : one layer's decode attention over the arena, x36
  * lm_head       : logits projection of 1 token
  * full chunk_step prefill-only (max_new=1) vs full (max_new=20)
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from streaming_vlm_tpu.config import qwen25_vl_3b
from streaming_vlm_tpu.models.qwen25_vl import language
from streaming_vlm_tpu.models.qwen25_vl.rope import make_inv_freq, mrope_cos_sin
from streaming_vlm_tpu.ops.attention import streaming_prefill_attention
from streaming_vlm_tpu.ops.quant import mm, quantize_language_params

cfg = qwen25_vl_3b().text
T, C = 640, 10240
H, Hkv, hd, D, I = (
    cfg.num_attention_heads,
    cfg.num_key_value_heads,
    cfg.head_dim,
    cfg.hidden_size,
    cfg.intermediate_size,
)
L = cfg.num_hidden_layers
print(f"3B geometry: L={L} D={D} H={H} Hkv={Hkv} hd={hd} I={I} V={cfg.vocab_size}")

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 16)
bf = jnp.bfloat16


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:8]  # force + compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:8]
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:34s} {best*1e3:9.2f} ms   ({[f'{t*1e3:.1f}' for t in ts]})")
    return best


q = jax.random.normal(ks[0], (T, H, hd), bf) * 0.3
ka = jax.random.normal(ks[1], (C, Hkv, hd), bf) * 0.3
va = jax.random.normal(ks[2], (C, Hkv, hd), bf) * 0.3
ksr = jax.random.normal(ks[3], (T, Hkv, hd), bf) * 0.3
vs = jax.random.normal(ks[4], (T, Hkv, hd), bf) * 0.3
ang = jnp.arange(C, dtype=jnp.float32)[:, None] / (
    cfg.rope_theta ** (jnp.arange(0, hd, 2, jnp.float32) / hd)
)
acos2 = jnp.concatenate([jnp.cos(ang)] * 2, -1)
asin2 = jnp.concatenate([jnp.sin(ang)] * 2, -1)
vis = jnp.asarray(C - 640 - 20, jnp.int32)

REPS = 36


@functools.partial(jax.jit, static_argnames=("t_b", "c_b"))
def attn_pallas_x36(q, ka, va, acos2, asin2, ksr, vs, vis, t_b=128, c_b=1024):
    def body(h, _):
        o = streaming_prefill_attention(
            h, ka, va, acos2, asin2, ksr, vs, vis, t_b=t_b, c_b=c_b
        )
        return o, None
    o, _ = jax.lax.scan(body, q, None, length=REPS)
    return o


@jax.jit
def attn_xla_x36(q, ka, va, acos2, asin2, ksr, vs, vis):
    half = acos2[:, :hd]  # cos over half dims, duplicated form
    rot = jnp.concatenate([-ka[:, :, hd // 2 :], ka[:, :, : hd // 2]], -1)
    k_rot = (
        ka.astype(jnp.float32) * acos2[:, None, :] + rot.astype(jnp.float32) * asin2[:, None, :]
    ).astype(bf)
    mask = jnp.broadcast_to((jnp.arange(C) < vis)[None, :], (T, C))
    smask = jnp.tril(jnp.ones((T, T), bool))

    def body(h, _):
        o = language._gqa_attention_multi(h, [(k_rot, va, mask), (ksr, vs, smask)])
        return o.reshape(T, H, hd), None

    o, _ = jax.lax.scan(body, q, None, length=REPS)
    return o


# one layer's dense matmuls (params int8-quantized like the bench)
lp_bf = {
    "q_w": jax.random.normal(ks[5], (D, H * hd), bf) * 0.02,
    "k_w": jax.random.normal(ks[6], (D, Hkv * hd), bf) * 0.02,
    "v_w": jax.random.normal(ks[7], (D, Hkv * hd), bf) * 0.02,
    "o_w": jax.random.normal(ks[8], (H * hd, D), bf) * 0.02,
    "gate_w": jax.random.normal(ks[9], (D, I), bf) * 0.02,
    "up_w": jax.random.normal(ks[10], (D, I), bf) * 0.02,
    "down_w": jax.random.normal(ks[11], (I, D), bf) * 0.02,
}
from streaming_vlm_tpu.ops.quant import quantize_weight

lp_q = {k: quantize_weight(v, contract_axis=-2) for k, v in lp_bf.items()}


def dense_x36(x, lp):
    def body(h, _):
        qq = mm(h, lp["q_w"])
        kk = mm(h, lp["k_w"])
        vv = mm(h, lp["v_w"])
        h = h + mm(qq, lp["o_w"])
        g = mm(h, lp["gate_w"])
        u = mm(h, lp["up_w"])
        h = h + mm(jax.nn.silu(g) * u, lp["down_w"])
        return h + kk.sum() * 0 + vv.sum() * 0, None

    o, _ = jax.lax.scan(body, x, None, length=REPS)
    return o


dense_x36_j = jax.jit(dense_x36)

x640 = jax.random.normal(ks[12], (T, D), bf) * 0.3
x1 = jax.random.normal(ks[13], (1, D), bf) * 0.3

# decode attention: 1 query over arena
@jax.jit
def decode_attn_x36(q1, ka, va, acos2, asin2, vis):
    rot = jnp.concatenate([-ka[:, :, hd // 2 :], ka[:, :, : hd // 2]], -1)
    mask = jnp.broadcast_to((jnp.arange(C) < vis)[None, :], (1, C))

    def body(h, _):
        k_rot = (
            ka.astype(jnp.float32) * acos2[:, None, :]
            + rot.astype(jnp.float32) * asin2[:, None, :]
        ).astype(bf)
        o = language._gqa_attention_multi(h, [(k_rot, va, mask)])
        return o.reshape(1, H, hd), None

    o, _ = jax.lax.scan(body, q1, None, length=REPS)
    return o


q1 = jax.random.normal(ks[14], (1, H, hd), bf) * 0.3

emb_q = quantize_weight(
    (jax.random.normal(ks[15], (cfg.vocab_size, D), bf) * 0.02).T, contract_axis=-2
)


@jax.jit
def lm_head_x1(h):
    from streaming_vlm_tpu.ops.quant import qdot

    return qdot(h, emb_q, out_dtype=jnp.float32)


print(f"\n== per-layer ops x{REPS} (steady-state shapes T={T}, C={C}) ==")
timeit("prefill_attn_pallas(128,1024)", attn_pallas_x36, q, ka, va, acos2, asin2, ksr, vs, vis)
for t_b, c_b in ((64, 1024), (128, 512), (256, 1024), (128, 2048), (64, 2048), (320, 1024), (640, 512)):
    try:
        timeit(
            f"prefill_attn_pallas({t_b},{c_b})",
            functools.partial(attn_pallas_x36, t_b=t_b, c_b=c_b),
            q, ka, va, acos2, asin2, ksr, vs, vis,
        )
    except Exception as e:
        print(f"prefill_attn_pallas({t_b},{c_b})  FAILED: {str(e)[:100]}")
timeit("prefill_attn_xla", attn_xla_x36, q, ka, va, acos2, asin2, ksr, vs, vis)
timeit("prefill_dense_int8 (T=640)", dense_x36_j, x640, lp_q)
timeit("prefill_dense_bf16 (T=640)", dense_x36_j, x640, lp_bf)
timeit("decode_dense_int8 (T=1)", dense_x36_j, x1, lp_q)
timeit("decode_dense_bf16 (T=1)", dense_x36_j, x1, lp_bf)
timeit("decode_attn_xla (T=1)", decode_attn_x36, q1, ka, va, acos2, asin2, vis)
timeit("lm_head_int8 (T=1)", lm_head_x1, x1)
