"""Qwen2.5-VL language model (decoder stack) in functional JAX.

Design (TPU-first, not a port):
  * All decoder layers are stacked along a leading axis and executed with
    `jax.lax.scan` — one compiled layer body regardless of depth.
  * The KV cache is a fixed-capacity arena `[layers, capacity, kv_heads,
    head_dim]`. K is stored UN-rotated; rotary embedding is applied to the
    arena K at attention time from a per-slot position tensor. This realises
    the reference's "shrink" semantics (un-rotated K cached, full-cache RoPE
    re-applied after contiguous re-indexing —
    /root/reference/src/streaming_vlm/inference/qwen2_5/language_forward.py:184-197)
    at flat per-token cost: the rotation is an elementwise op on K tiles the
    attention already reads.
  * Static shapes everywhere: chunk prefill is padded to bucket sizes, decode
    is length-1; the arena never changes shape.

Parity targets (file:line in /root/reference):
  * decoder layer math: src/streaming_vlm/inference/qwen2_5/language_forward.py:262-305
  * attention (eager path): language_forward.py:69-140
  * right-aligned q-slice when q_len != k_len: language_forward.py:46-56
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import TextConfig
from .rope import apply_rope, make_inv_freq, mrope_cos_sin

Params = Dict[str, Any]

NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free on fully-padded rows


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * scale.astype(jnp.float32)).astype(dtype)


def swiglu(x: jnp.ndarray, gate_w, up_w, down_w) -> jnp.ndarray:
    g = jnp.dot(x, gate_w)
    u = jnp.dot(x, up_w)
    return jnp.dot(jax.nn.silu(g) * u, down_w)


# ---------------------------------------------------------------------------
# Parameter initialisation / shape spec
# ---------------------------------------------------------------------------


def init_language_params(
    cfg: TextConfig, key: jax.Array, dtype=jnp.float32
) -> Params:
    """Random-init parameters with HF-compatible shapes (transposed to [in, out])."""
    L = cfg.num_hidden_layers
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    hd = cfg.head_dim
    I = cfg.intermediate_size
    V = cfg.vocab_size

    ks = jax.random.split(key, 12)

    def norm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params = {
        "embed": norm(ks[0], (V, D)),
        "layers": {
            "input_ln": jnp.ones((L, D), dtype),
            "q_w": norm(ks[1], (L, D, H * hd)),
            "q_b": jnp.zeros((L, H * hd), dtype),
            "k_w": norm(ks[2], (L, D, Hkv * hd)),
            "k_b": jnp.zeros((L, Hkv * hd), dtype),
            "v_w": norm(ks[3], (L, D, Hkv * hd)),
            "v_b": jnp.zeros((L, Hkv * hd), dtype),
            "o_w": norm(ks[4], (L, H * hd, D)),
            "post_ln": jnp.ones((L, D), dtype),
            "gate_w": norm(ks[5], (L, D, I)),
            "up_w": norm(ks[6], (L, D, I)),
            "down_w": norm(ks[7], (L, I, D)),
        },
        "final_ln": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm(ks[8], (D, V))
    return params


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def _gqa_attention(
    q: jnp.ndarray,  # [T, H, hd] (rotated)
    k: jnp.ndarray,  # [S, Hkv, hd] (rotated)
    v: jnp.ndarray,  # [S, Hkv, hd]
    mask: jnp.ndarray,  # [T, S] bool — True = attend
) -> jnp.ndarray:
    T, H, hd = q.shape
    S, Hkv, _ = k.shape
    G = H // Hkv
    scale = 1.0 / np.sqrt(hd)
    qg = q.reshape(T, Hkv, G, hd)
    logits = jnp.einsum(
        "tkgd,skd->kgts", qg, k, preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(mask[None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("kgts,skd->tkgd", probs, v)
    return out.reshape(T, H * hd)


def _layer_body(
    cfg: TextConfig,
    carry: Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]], Any],
    lp: Params,
    *,
    q_cos,
    q_sin,
    k_cos,
    k_sin,
    mask,
    insert_at,
):
    """One decoder layer. carry = (hidden [T, D], (k_arena, v_arena) iterator slot)."""
    hidden, k_arena_l, v_arena_l = carry
    T = hidden.shape[0]
    H = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    hd = cfg.head_dim

    x = rms_norm(hidden, lp["input_ln"], cfg.rms_norm_eps)
    q = (jnp.dot(x, lp["q_w"]) + lp["q_b"]).reshape(T, H, hd)
    k_new = (jnp.dot(x, lp["k_w"]) + lp["k_b"]).reshape(T, Hkv, hd)
    v_new = (jnp.dot(x, lp["v_w"]) + lp["v_b"]).reshape(T, Hkv, hd)

    q = apply_rope(q, q_cos[:, None, :], q_sin[:, None, :])

    if k_arena_l is not None:
        # Streaming path: write raw K/V into the arena, rotate the whole arena
        # K with per-slot positions, attend over all slots.
        k_arena_l = jax.lax.dynamic_update_slice(k_arena_l, k_new, (insert_at, 0, 0))
        v_arena_l = jax.lax.dynamic_update_slice(v_arena_l, v_new, (insert_at, 0, 0))
        k_rot = apply_rope(k_arena_l, k_cos[:, None, :], k_sin[:, None, :])
        attn = _gqa_attention(q, k_rot, v_arena_l, mask)
    else:
        # Full (offline/training) path: rotate current K, causal attention.
        k_rot = apply_rope(k_new, k_cos[:, None, :], k_sin[:, None, :])
        attn = _gqa_attention(q, k_rot, v_new, mask)

    hidden = hidden + jnp.dot(attn, lp["o_w"])
    x = rms_norm(hidden, lp["post_ln"], cfg.rms_norm_eps)
    hidden = hidden + swiglu(x, lp["gate_w"], lp["up_w"], lp["down_w"])
    return hidden, k_arena_l, v_arena_l


def language_forward(
    cfg: TextConfig,
    params: Params,
    inputs_embeds: jnp.ndarray,  # [T, D]
    positions: jnp.ndarray,  # [3, T] float32 — positions of the T current tokens
    *,
    kv_arena: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    # [layers, capacity, Hkv, hd] x2 — un-rotated K, V
    slot_positions: Optional[jnp.ndarray] = None,  # [3, capacity] float32
    insert_at: Optional[jnp.ndarray] = None,  # scalar int32: first slot for new tokens
    attn_mask: Optional[jnp.ndarray] = None,  # [T, S] bool; default causal
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Run the decoder stack. Returns (hidden [T, D] post-final-norm, new arena).

    Streaming mode (kv_arena given): new K/V are written at slots
    [insert_at, insert_at+T); attention spans the whole arena with
    `attn_mask` [T, capacity]. K in the arena is un-rotated; rotation uses
    `slot_positions`.

    Offline mode (kv_arena None): plain causal self-attention over T tokens.
    """
    T = inputs_embeds.shape[0]
    inv_freq = jnp.asarray(make_inv_freq(cfg.head_dim, cfg.rope_theta))

    q_cos, q_sin = mrope_cos_sin(positions, inv_freq, cfg.mrope_section)

    if kv_arena is not None:
        assert slot_positions is not None and insert_at is not None
        k_cos, k_sin = mrope_cos_sin(slot_positions, inv_freq, cfg.mrope_section)
        capacity = kv_arena[0].shape[1]
        if attn_mask is None:
            slot_ids = jnp.arange(capacity)[None, :]
            row_ids = jnp.arange(T)[:, None]
            attn_mask = slot_ids <= (insert_at + row_ids)
        mask = attn_mask
    else:
        k_cos, k_sin = q_cos, q_sin
        if attn_mask is None:
            attn_mask = jnp.tril(jnp.ones((T, T), bool))
        mask = attn_mask

    body = partial(
        _layer_body,
        cfg,
        q_cos=q_cos,
        q_sin=q_sin,
        k_cos=k_cos,
        k_sin=k_sin,
        mask=mask,
        insert_at=insert_at if insert_at is not None else 0,
    )

    if kv_arena is not None:

        def scan_fn(hidden, layer_in):
            lp, k_l, v_l = layer_in
            hidden, k_l, v_l = body((hidden, k_l, v_l), lp)
            return hidden, (k_l, v_l)

        hidden, (new_k, new_v) = jax.lax.scan(
            scan_fn, inputs_embeds, (params["layers"], kv_arena[0], kv_arena[1])
        )
        new_arena = (new_k, new_v)
    else:

        def scan_fn(hidden, lp):
            hidden, _, _ = body((hidden, None, None), lp)
            return hidden, None

        hidden, _ = jax.lax.scan(scan_fn, inputs_embeds, params["layers"])
        new_arena = None

    hidden = rms_norm(hidden, params["final_ln"], cfg.rms_norm_eps)
    return hidden, new_arena


def embed_tokens(cfg: TextConfig, params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"], input_ids, axis=0)


def lm_logits(cfg: TextConfig, params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """[T, D] -> [T, V] float32 logits."""
    w = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)


def init_kv_arena(
    cfg: TextConfig, capacity: int, dtype=jnp.bfloat16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shape = (cfg.num_hidden_layers, capacity, cfg.num_key_value_heads, cfg.head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
