"""Device-time per chunk_step PIECE, each scanned N times inside ONE jit
(amortizes the axon tunnel's per-dispatch latency; a carry dependency defeats
CSE). Cross-check: sum of pieces ~= chunk_step device time (~185 ms measured
via tools/profile_sections.py).

Pieces: arena K rotation, compaction gather, prefill dense stack (no attn),
prefill pallas attention stack, decode dense step, decode attention step,
lm_logits, positions-from-descriptors, presence scatter.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_pieces.py
Env: SVT_QUANT=none for bf16 weights.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from streaming_vlm_tpu.config import qwen25_vl_3b
from streaming_vlm_tpu.models.qwen25_vl import language
from streaming_vlm_tpu.models.qwen25_vl.rope import (
    apply_rope,
    make_inv_freq,
    mrope_cos_sin,
)
from streaming_vlm_tpu.ops.attention import streaming_prefill_attention
from streaming_vlm_tpu.ops.quant import mm

import argparse

from streaming_vlm_tpu.config import qwen25_vl_7b

_ap = argparse.ArgumentParser()
_ap.add_argument("--model", choices=("3b", "7b"), default="3b")
_args = _ap.parse_args()
cfg = qwen25_vl_3b() if _args.model == "3b" else qwen25_vl_7b()
tcfg = cfg.text
L = tcfg.num_hidden_layers
D = tcfg.hidden_size
H = tcfg.num_attention_heads
Hkv = tcfg.num_key_value_heads
hd = tcfg.head_dim
C = 10240
T = 640

key = jax.random.PRNGKey(0)


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:4]))


def timed(tag, fn, *args, n_disp=5):
    f = jax.jit(fn)
    fence(f(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n_disp):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n_disp
    print(f"{tag:34s} {dt * 1e3:9.2f} ms/dispatch", flush=True)
    return dt


def main():
    from streaming_vlm_tpu.models.qwen25_vl import model as m

    if _args.model == "7b":
        # bf16 init + convert would OOM on a 16 GB chip: build quantized
        from streaming_vlm_tpu.ops.quant import random_quantized_model_params

        params = random_quantized_model_params(cfg, key)
    else:
        params = m.init_params(cfg, key, dtype=jnp.bfloat16)
        if os.environ.get("SVT_QUANT", "int8") == "int8":
            from streaming_vlm_tpu.ops.quant import quantize_model_params

            params = quantize_model_params(params, donate=True)
    params = jax.tree.map(jax.block_until_ready, params)
    lp = params["text"]["layers"]

    k_arena = jax.random.normal(key, (L, C, Hkv, hd), jnp.bfloat16)
    v_arena = jax.random.normal(key, (L, C, Hkv, hd), jnp.bfloat16)
    slot_pos = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.float32), (3, C)
    )
    inv_freq = jnp.asarray(make_inv_freq(tcfg.head_dim, tcfg.rope_theta))
    embeds = jax.random.normal(key, (T, D), jnp.bfloat16)
    REPS = 8

    # --- arena K rotation (per chunk) ---
    def rot_n(k_arena, slot_pos):
        def body(carry, _):
            a_cos, a_sin = mrope_cos_sin(slot_pos, inv_freq, tcfg.mrope_section)
            kr = apply_rope(carry, a_cos[:, None, :], a_sin[:, None, :])
            return kr, ()

        out, _ = jax.lax.scan(body, k_arena, None, length=REPS)
        return out

    t = timed("arena K rotate (x8 in-graph)", rot_n, k_arena, slot_pos)
    print(f"  -> per chunk: {t / REPS * 1e3:7.2f} ms")

    # --- compaction gather ---
    src = jnp.roll(jnp.arange(C, dtype=jnp.int32), 100)

    def compact_n(k, v, src):
        def body(carry, _):
            k, v = carry
            return (jnp.take(k, src, axis=1), jnp.take(v, src, axis=1)), ()

        (k, v), _ = jax.lax.scan(body, (k, v), None, length=REPS)
        return k[0, 0, 0], v[0, 0, 0]

    t = timed("compaction gather (x8)", compact_n, k_arena, v_arena, src)
    print(f"  -> per chunk: {t / REPS * 1e3:7.2f} ms")

    # --- prefill dense stack (QKVO+MLP over 36 layers, no attention) ---
    def prefill_dense(embeds, lp):
        def layer(hidden, xs):
            lpl = xs
            x = language.rms_norm(hidden, lpl["input_ln"], tcfg.rms_norm_eps)
            q = (mm(x, lpl["q_w"]) + lpl["q_b"]).reshape(T, H, hd)
            k = (mm(x, lpl["k_w"]) + lpl["k_b"]).reshape(T, Hkv, hd)
            v = (mm(x, lpl["v_w"]) + lpl["v_b"]).reshape(T, Hkv, hd)
            attn = (q + 0.001 * jnp.repeat(k, H // Hkv, 1) + 0.001 * jnp.repeat(v, H // Hkv, 1)).reshape(T, H * hd)
            hidden = hidden + mm(attn.astype(x.dtype), lpl["o_w"])
            x = language.rms_norm(hidden, lpl["post_ln"], tcfg.rms_norm_eps)
            hidden = hidden + language.swiglu(x, lpl["gate_w"], lpl["up_w"], lpl["down_w"])
            return hidden, ()

        h, _ = jax.lax.scan(layer, embeds, lp)
        return h[0, :4]

    timed("prefill dense 36L (T=640)", prefill_dense, embeds, lp)

    # --- prefill dense with FUSED weights: qkv one dot, gate+up one dot ---
    # (weights pre-concatenated OUTSIDE the graph: layout candidates)
    if os.environ.get("SVT_QUANT", "int8") == "int8":
        def cat_q(*ws):
            return {
                "q": jnp.concatenate([w["q"] for w in ws], axis=-1),
                "s": jnp.concatenate([w["s"] for w in ws], axis=-1),
            }

        qkv_w = cat_q(lp["q_w"], lp["k_w"], lp["v_w"])
        gu_w = cat_q(lp["gate_w"], lp["up_w"])
    else:
        qkv_w = jnp.concatenate([lp["q_w"], lp["k_w"], lp["v_w"]], axis=-1)
        gu_w = jnp.concatenate([lp["gate_w"], lp["up_w"]], axis=-1)
    qkv_b = jnp.concatenate([lp["q_b"], lp["k_b"], lp["v_b"]], axis=-1)
    lpf = {**{k: lp[k] for k in ("input_ln", "post_ln", "o_w", "down_w")},
           "qkv_w": qkv_w, "qkv_b": qkv_b, "gu_w": gu_w}
    I = tcfg.intermediate_size
    emb1 = jax.random.normal(key, (1, D), jnp.bfloat16)

    def prefill_dense_fused(embeds, lpf):
        def layer(hidden, xs):
            lpl = xs
            x = language.rms_norm(hidden, lpl["input_ln"], tcfg.rms_norm_eps)
            qkv = mm(x, lpl["qkv_w"]) + lpl["qkv_b"]
            q = qkv[:, : H * hd].reshape(T, H, hd)
            k = qkv[:, H * hd : (H + Hkv) * hd].reshape(T, Hkv, hd)
            v = qkv[:, (H + Hkv) * hd :].reshape(T, Hkv, hd)
            attn = (q + 0.001 * jnp.repeat(k, H // Hkv, 1) + 0.001 * jnp.repeat(v, H // Hkv, 1)).reshape(T, H * hd)
            hidden = hidden + mm(attn.astype(x.dtype), lpl["o_w"])
            x = language.rms_norm(hidden, lpl["post_ln"], tcfg.rms_norm_eps)
            gu = mm(x, lpl["gu_w"])
            act = jax.nn.silu(gu[:, :I].astype(jnp.float32)).astype(x.dtype) * gu[:, I:]
            hidden = hidden + mm(act, lpl["down_w"])
            return hidden, ()

        h, _ = jax.lax.scan(layer, embeds, lpf)
        return h[0, :4]

    timed("prefill dense FUSED 36L (T=640)", prefill_dense_fused, embeds, lpf)

    def decode_dense_fused(emb1, lpf):
        def step(carry, _):
            def layer(hidden, xs):
                lpl = xs
                x = language.rms_norm(hidden, lpl["input_ln"], tcfg.rms_norm_eps)
                qkv = mm(x, lpl["qkv_w"]) + lpl["qkv_b"]
                q = qkv[:, : H * hd].reshape(1, H, hd)
                k = qkv[:, H * hd : (H + Hkv) * hd].reshape(1, Hkv, hd)
                v = qkv[:, (H + Hkv) * hd :].reshape(1, Hkv, hd)
                attn = (q + 0.001 * jnp.repeat(k, H // Hkv, 1) + 0.001 * jnp.repeat(v, H // Hkv, 1)).reshape(1, H * hd)
                hidden = hidden + mm(attn.astype(x.dtype), lpl["o_w"])
                x = language.rms_norm(hidden, lpl["post_ln"], tcfg.rms_norm_eps)
                gu = mm(x, lpl["gu_w"])
                act = jax.nn.silu(gu[:, :I].astype(jnp.float32)).astype(x.dtype) * gu[:, I:]
                hidden = hidden + mm(act, lpl["down_w"])
                return hidden, ()

            h, _ = jax.lax.scan(layer, carry, lpf)
            return h * 0.5 + emb1 * 0.5, ()

        h, _ = jax.lax.scan(step, emb1, None, length=REPS)
        return h[0, :4]

    t = timed("decode dense FUSED 36L (x8 steps)", decode_dense_fused, emb1, lpf)
    print(f"  -> per token: {t / REPS * 1e3:7.2f} ms")

    # --- prefill attention stack: 36 layers of the pallas kernel ---
    q_rot = jax.random.normal(key, (T, H, hd), jnp.bfloat16)
    k_self = jax.random.normal(key, (T, Hkv, hd), jnp.bfloat16)
    v_self = jax.random.normal(key, (T, Hkv, hd), jnp.bfloat16)
    vis = jnp.asarray(9000, jnp.int32)

    def prefill_attn(q_rot, k_arena, v_arena, k_self, v_self):
        def body(carry, xs):
            ak, av = xs
            o = streaming_prefill_attention(
                carry, ak, av, None, None, k_self, v_self, vis,
                t_b=128, c_b=1024,
            )
            return o.astype(carry.dtype), ()

        o, _ = jax.lax.scan(body, q_rot, (k_arena, v_arena))
        return o[0, 0, :4]

    timed("prefill pallas attn 36L", prefill_attn, q_rot, k_arena, v_arena, k_self, v_self)

    # --- decode dense (T=1) stacked layers, x8 steps in-graph ---

    def decode_dense(emb1, lp):
        def step(carry, _):
            def layer(hidden, xs):
                lpl = xs
                x = language.rms_norm(hidden, lpl["input_ln"], tcfg.rms_norm_eps)
                q = (mm(x, lpl["q_w"]) + lpl["q_b"]).reshape(1, H, hd)
                k = (mm(x, lpl["k_w"]) + lpl["k_b"]).reshape(1, Hkv, hd)
                v = (mm(x, lpl["v_w"]) + lpl["v_b"]).reshape(1, Hkv, hd)
                attn = (q + 0.001 * jnp.repeat(k, H // Hkv, 1) + 0.001 * jnp.repeat(v, H // Hkv, 1)).reshape(1, H * hd)
                hidden = hidden + mm(attn.astype(x.dtype), lpl["o_w"])
                x = language.rms_norm(hidden, lpl["post_ln"], tcfg.rms_norm_eps)
                hidden = hidden + language.swiglu(x, lpl["gate_w"], lpl["up_w"], lpl["down_w"])
                return hidden, ()

            h, _ = jax.lax.scan(layer, carry, lp)
            return h * 0.5 + emb1 * 0.5, ()

        h, _ = jax.lax.scan(step, emb1, None, length=REPS)
        return h[0, :4]

    t = timed("decode dense 36L (x8 steps)", decode_dense, emb1, lp)
    print(f"  -> per token: {t / REPS * 1e3:7.2f} ms")

    # --- decode attention over arena (T=1), x8 steps ---
    q1 = jax.random.normal(key, (1, H, hd), jnp.bfloat16)

    def decode_attn(q1, k_arena, v_arena):
        def step(carry, _):
            def layer(q, xs):
                ak, av = xs
                mask = jnp.broadcast_to((jnp.arange(C) < vis)[None, :], (1, C))
                o = language._gqa_attention_multi(q, [(ak, av, mask)])
                return (q + 0.001 * o.reshape(1, H, hd)).astype(q.dtype), ()

            o, _ = jax.lax.scan(layer, carry, (k_arena, v_arena))
            return o, ()

        o, _ = jax.lax.scan(step, q1, None, length=REPS)
        return o[0, 0, :4]

    t = timed("decode attn 36L (x8 steps)", decode_attn, q1, k_arena, v_arena)
    print(f"  -> per token: {t / REPS * 1e3:7.2f} ms")

    # --- lm_logits (1 token), x8 ---
    h1 = jax.random.normal(key, (1, D), jnp.bfloat16)

    def lm_n(h1, pt):
        def body(carry, _):
            lg = language.lm_logits(tcfg, pt, carry)
            return carry + 1e-6 * lg[:, :D].astype(carry.dtype), ()

        h, _ = jax.lax.scan(body, h1, None, length=REPS)
        return h[0, :4]

    t = timed("lm_logits 1 tok (x8)", lm_n, h1, params["text"])
    print(f"  -> per token: {t / REPS * 1e3:7.2f} ms")

    # --- positions from descriptors + cos/sin (per chunk) ---
    from streaming_vlm_tpu.streaming.engine import positions_from_descriptors

    desc = {
        "starts": jnp.arange(0, 256 * 40, 40, dtype=jnp.int32),
        "ghs": jnp.full((256,), 32, jnp.int32),
        "gws": jnp.full((256,), 64, jnp.int32),
        "kinds": jnp.ones((256,), jnp.int32),
        "tsteps": jnp.ones((256,), jnp.float32),
        "bases": jnp.zeros((256,), jnp.float32),
    }

    def pos_n(desc):
        def body(carry, _):
            p = positions_from_descriptors(desc, C)
            cos, sin = mrope_cos_sin(p, inv_freq, tcfg.mrope_section)
            return carry + cos[0, 0] + sin[0, 0], ()

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return s

    t = timed("positions+cos/sin (x8)", pos_n, desc)
    print(f"  -> per chunk: {t / REPS * 1e3:7.2f} ms")

    # --- presence scatter (per chunk) ---
    ids = jnp.arange(C, dtype=jnp.int32) % tcfg.vocab_size

    def pres_n(ids):
        def body(carry, i):
            pres = jnp.zeros(tcfg.vocab_size, jnp.bool_).at[ids + i].set(True, mode="drop")
            return carry + jnp.sum(pres), ()

        s, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(REPS))
        return s

    t = timed("presence scatter (x8)", pres_n, ids)
    print(f"  -> per chunk: {t / REPS * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
