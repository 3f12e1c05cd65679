"""Weight/activation int8 quantization for the decode-bandwidth bottleneck.

Decode at B=1 is weight-bandwidth-bound: every generated token reads every
language-model weight once (~6 GB in bf16 for the 3B model — ~9.6 ms/token at
the measured ~690 GB/s v5e roofline, ~190 ms of the ~370 ms chunk). The
reference leans on an H100's 3.3 TB/s HBM to hit its 8 FPS headline
(/root/reference/readme.md:11); on TPU the equivalent lever is cutting the
bytes: store weights int8 (half the traffic) and feed the MXU s8 x s8 -> s32
dots directly (v5e int8 matmul runs at 2x the bf16 rate, and skipping the
int8->bf16 convert keeps the VPU out of the hot path — a convert-then-bf16-dot
variant measured only ~217 GB/s effective).

Scheme (standard W8A8 dynamic quantization):
  * weights: per-output-channel symmetric scales over the input dim,
    q = round(w / s), s = max|w| / 127 per column
  * activations: per-row (per-token) dynamic symmetric scales computed
    in-graph at each matmul
  * accumulate s8 x s8 -> s32 on the MXU, rescale by (s_act * s_col)

The quantized parameter tree REPLACES the bf16 weights (halving weight HBM),
keeping biases, norms and the embedding table (needed for gathers) in the
original dtype; the lm_head projection of tied embeddings gets its own
quantized copy.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# keys of the stacked [L, in, out] decoder-layer weight tensors
LAYER_WEIGHTS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")
# vision-tower weight tensors (qwen2_5 + qwen2 variants; missing keys skipped)
VISION_BLOCK_WEIGHTS = ("qkv_w", "proj_w", "gate_w", "up_w", "down_w", "fc1_w", "fc2_w")
VISION_MERGER_WEIGHTS = ("fc1_w", "fc2_w")


from functools import partial


@partial(jax.jit, static_argnames=("contract_axis",), donate_argnums=(0,))
def _quantize_weight_donating(w, *, contract_axis):
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


@partial(jax.jit, static_argnames=("contract_axis",))
def _quantize_weight(w, *, contract_axis):
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def quantize_weight(
    w: jnp.ndarray, *, contract_axis: int = -2, donate: bool = False
) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a [in, out] (or
    stacked [L, in, out]) weight. Returns {"q": int8, "s": f32 broadcastable}.
    Jitted so the f32 intermediates fuse instead of materialising several
    full-tensor temporaries in HBM; `donate=True` additionally frees the
    source buffer in place (use when the original tree is being replaced)."""
    ax = contract_axis if contract_axis >= 0 else w.ndim + contract_axis
    fn = _quantize_weight_donating if donate else _quantize_weight
    return fn(w, contract_axis=ax)


INT4_GROUP = 128  # contract-dim rows per int4 scale group


@partial(jax.jit, static_argnames=("contract_axis", "group"))
def _quantize_weight_int4(w, *, contract_axis, group):
    # move the contract axis to -2 for uniform handling, restore at the end
    wf = jnp.moveaxis(w.astype(jnp.float32), contract_axis, -2)
    *lead, D, F = wf.shape
    ng = D // group
    wg = wf.reshape(*lead, ng, group, F)
    s = jnp.max(jnp.abs(wg), axis=-2, keepdims=True) / 7.0  # [*, ng, 1, F]
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wg / s), -7, 7).astype(jnp.int8).reshape(*lead, D, F)
    # pack contract-dim pairs into one byte: row 2d -> low nibble, 2d+1 -> high
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    packed = (lo & 0xF) | (hi << 4)
    return {
        "q4": jnp.moveaxis(packed, -2, contract_axis),
        "s": s[..., 0, :],  # [*, ng, F]
    }


def quantize_weight_int4(
    w: jnp.ndarray, *, contract_axis: int = -2, group: int = INT4_GROUP,
    donate: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Symmetric group-wise int4 quantization, two values packed per int8
    byte along the CONTRACT axis (so the matmul can unpack into two
    half-depth s8 x s8 dots without re-interleaving). Scales are per
    (contract-group, output-channel) — `group` rows share one scale, the
    standard int4 accuracy fix over per-channel scaling. Returns
    {"q4": int8 [..., D/2, F], "s": f32 [..., D/group, F]}. Decode at B=1 is
    weight-bandwidth-bound: int4 halves HBM traffic again vs int8 at the
    cost of a nibble unpack (shift VPU ops) feeding the MXU."""
    ax = contract_axis if contract_axis >= 0 else w.ndim + contract_axis
    D = w.shape[ax]
    assert D % 2 == 0, (w.shape, ax)
    g = group if D % group == 0 else D
    out = _quantize_weight_int4(w, contract_axis=ax, group=g)
    if donate and isinstance(w, jax.Array):
        # free the bf16 source as soon as its packed copy exists — the
        # conversion-time HBM headroom donation promises (the int8 path
        # donates through jit argnums; packing reads w once, so an explicit
        # post-hoc delete achieves the same peak after this weight)
        jax.block_until_ready(out)
        w.delete()
    return out


def qdot4(
    x: jnp.ndarray,  # [T, D]
    qt: Dict[str, jnp.ndarray],  # {"q4": [D//2, F] int8 packed, "s": [ng, F]}
    out_dtype=None,
) -> jnp.ndarray:
    """Dynamic-activation int8 x packed-int4 matmul with group-wise weight
    scales. The even/odd split of the contraction keeps the unpacked nibbles
    as two [D/2, F] operands (sign extension = two shifts, no [D, F]
    re-interleave); grouping splits the contraction into ng partial s8 dots:
      x @ W = sum_g (x_even_g @ W_lo_g + x_odd_g @ W_hi_g) * s_g"""
    packed = qt["q4"]  # [D/2, F]
    s = qt["s"]  # [ng, F]
    D2, F = packed.shape[-2], packed.shape[-1]
    D = 2 * D2
    ng = s.shape[-2]
    group = D // ng
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # [T, 1]
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    # numpy shift semantics: >> on signed int8 is arithmetic (sign-extending)
    w_lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    w_hi = jnp.right_shift(packed, 4)
    T = xq.shape[0]
    if T >= 32:
        # prefill-shaped: compute-bound, so skip activation quantization and
        # dequantize W to bf16 once ([D, F] interleave materialises, ~2x the
        # packed bytes — cheap at large T, and the MXU runs a plain bf16 dot)
        q_full = jnp.stack([w_lo, w_hi], axis=-2).reshape(D, F)
        w_bf = (
            q_full.reshape(ng, group, F).astype(jnp.float32) * s[:, None, :]
        ).reshape(D, F).astype(jnp.bfloat16)
        out = jnp.dot(x.astype(jnp.bfloat16), w_bf, preferred_element_type=jnp.float32)
        return out.astype(out_dtype or x.dtype)
    if ng == 1:
        dn = (((1,), (0,)), ((), ()))
        acc = jax.lax.dot_general(
            xq[:, 0::2], w_lo, dimension_numbers=dn, preferred_element_type=jnp.int32
        ) + jax.lax.dot_general(
            xq[:, 1::2], w_hi, dimension_numbers=dn, preferred_element_type=jnp.int32
        )
        out = acc.astype(jnp.float32) * (sx * s)
    else:
        # batched over groups: [ng, T, group/2] x [ng, group/2, F] -> [ng, T, F]
        xg = xq.reshape(T, ng, group)
        xe = xg[..., 0::2].transpose(1, 0, 2)
        xo = xg[..., 1::2].transpose(1, 0, 2)
        wl = w_lo.reshape(ng, group // 2, F)
        wh = w_hi.reshape(ng, group // 2, F)
        dn = (((2,), (1,)), ((0,), (0,)))
        acc = jax.lax.dot_general(
            xe, wl, dimension_numbers=dn, preferred_element_type=jnp.int32
        ) + jax.lax.dot_general(
            xo, wh, dimension_numbers=dn, preferred_element_type=jnp.int32
        )  # [ng, T, F]
        out = jnp.sum(acc.astype(jnp.float32) * s[:, None, :], axis=0) * sx
    return out.astype(out_dtype or x.dtype)


def is_qtensor(w) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w) and "s" in w


def is_model_quantized(params) -> bool:
    """True when a full VLM parameter tree already holds QTensor leaves
    (e.g. a pre-quantized serving checkpoint, models/convert.py) — callers
    that quantize on load must skip their own pass."""
    found = []

    def walk(node):
        if is_qtensor(node):
            found.append(True)
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return bool(found)


# ---------------------------------------------------------------------------
# KV-cache quantization (int8 arena)
# ---------------------------------------------------------------------------
#
# The streaming KV arena is the marginal HBM cost of every extra concurrent
# stream (multi-stream serving) and the binding constraint of the
# full-attention efficiency ablation. Storing it int8 with per-(slot, head)
# symmetric scales over head_dim halves that footprint. K is quantized in its
# UN-rotated form (rotation is orthogonal per frequency pair, so quantization
# noise passes through RoPE unamplified); dequantization happens per layer
# inside the decoder scan — the transient bf16 slice is one layer's worth,
# never a full-arena copy. The arena travels as a {"q", "s"} pytree through
# jit/scan/vmap/donation unchanged, so every engine path (single-stream,
# batched multi-stream, compaction gather) works on both representations.


def quantize_kv(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., hd] float -> {"q": int8 [..., hd], "s": f32 [...]} with symmetric
    per-leading-index absmax scales over the last (head_dim) axis."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def dequantize_kv(t: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    return (t["q"].astype(jnp.float32) * t["s"][..., None]).astype(dtype)


def is_kv_quantized(t) -> bool:
    return isinstance(t, dict) and "q" in t


def qdot(
    x: jnp.ndarray,  # [T, D] (any float dtype)
    qt: Dict[str, jnp.ndarray],  # {"q": [D, F] int8, "s": [1, F] f32}
    out_dtype=None,
) -> jnp.ndarray:
    """Dynamic-activation-quantized matmul: per-row int8 x per-column int8 ->
    int32 MXU accumulate, rescaled to float. [T, D] @ [D, F] -> [T, F]."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # [T, 1]
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        qt["q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (sx * qt["s"])
    return out.astype(out_dtype or x.dtype)


def mm(x: jnp.ndarray, w, out_dtype=None) -> jnp.ndarray:
    """Matmul that dispatches on the weight's representation: int8 QTensor ->
    dynamic W8A8 path, int4 QTensor -> W4A8 path, plain array -> jnp.dot. The
    single seam through which every language-model weight is applied
    (quantization is a parameter-tree transform, not a model rewrite)."""
    if is_qtensor(w):
        if "q4" in w:
            return qdot4(x, w, out_dtype=out_dtype)
        return qdot(x, w, out_dtype=out_dtype)
    r = jnp.dot(x, w, preferred_element_type=out_dtype) if out_dtype else jnp.dot(x, w)
    return r


def quantize_language_params(
    params_text: Params, *, donate: bool = False, bits: int = 8
) -> Params:
    """Quantize the decoder-layer weights + lm_head of a language-model
    parameter tree (models/qwen25_vl/language.py layout). Keeps embed /
    biases / norms in their original dtype; tied embeddings get a separate
    quantized lm_head copy ("lm_head_q") while the bf16 embedding table stays
    for token gathers. `donate=True` frees each bf16 weight as it is
    converted (halves peak HBM during conversion; the input tree becomes
    unusable). `bits=4` packs two values per byte (quarter the bf16 traffic —
    decode at B=1 is weight-bandwidth-bound) with per-output-channel scales."""
    assert bits in (4, 8), bits
    qw = (
        (lambda w, donate=False: quantize_weight_int4(w, contract_axis=-2, donate=donate))
        if bits == 4
        else (lambda w, donate=False: quantize_weight(w, contract_axis=-2, donate=donate))
    )
    out = dict(params_text)
    layers = dict(params_text["layers"])
    for k in LAYER_WEIGHTS:
        layers[k] = qw(layers[k], donate=donate)
    out["layers"] = layers
    if "lm_head" in params_text:
        out["lm_head"] = qw(params_text["lm_head"], donate=donate)
    else:  # tied embeddings: quantize embed.T for the logits projection
        out["lm_head_q"] = qw(params_text["embed"].T)
    return out


def quantize_vision_params(params_vision: Params, *, donate: bool = False) -> Params:
    """Quantize the ViT block + merger weights (models/qwen25_vl/vision.py
    layout). The patch-embed projection stays in the original dtype — its
    input is raw normalised pixels whose dynamic range W8A8 handles poorly,
    and it is a tiny fraction of encode FLOPs."""
    out = dict(params_vision)
    blocks = dict(params_vision["blocks"])
    for k in VISION_BLOCK_WEIGHTS:
        if k in blocks:
            blocks[k] = quantize_weight(blocks[k], contract_axis=-2, donate=donate)
    out["blocks"] = blocks
    merger = dict(params_vision["merger"])
    for k in VISION_MERGER_WEIGHTS:
        merger[k] = quantize_weight(merger[k], contract_axis=-2, donate=donate)
    out["merger"] = merger
    return out


def random_quantized_model_params(cfg, key, dtype=jnp.bfloat16) -> Params:
    """Random-init parameter tree built DIRECTLY in the int8-quantized layout
    (structurally identical to quantize_model_params(model.init_params(...))).
    For benchmarking model sizes whose bf16 tree cannot coexist with its own
    quantization on one chip: Qwen2.5-VL-7B is ~15.2 GB bf16 — init + convert
    would OOM a 16 GB v5e — but ~8.3 GB in this layout."""
    from ..models.qwen25_vl import vision as vision_mod

    tcfg = cfg.text
    L, D = tcfg.num_hidden_layers, tcfg.hidden_size
    H, Hkv, hd = (
        tcfg.num_attention_heads,
        tcfg.num_key_value_heads,
        tcfg.head_dim,
    )
    I, V = tcfg.intermediate_size, tcfg.vocab_size
    ks = iter(jax.random.split(key, 16))

    def qrand(shape):
        q = jax.random.randint(next(ks), shape, -127, 128, dtype=jnp.int8)
        s = jnp.full((*shape[:-2], 1, shape[-1]), 0.02 / 127.0, jnp.float32)
        return {"q": q, "s": s}

    layers = {
        "input_ln": jnp.ones((L, D), dtype),
        "q_w": qrand((L, D, H * hd)),
        "q_b": jnp.zeros((L, H * hd), dtype),
        "k_w": qrand((L, D, Hkv * hd)),
        "k_b": jnp.zeros((L, Hkv * hd), dtype),
        "v_w": qrand((L, D, Hkv * hd)),
        "v_b": jnp.zeros((L, Hkv * hd), dtype),
        "o_w": qrand((L, H * hd, D)),
        "post_ln": jnp.ones((L, D), dtype),
        "gate_w": qrand((L, D, I)),
        "up_w": qrand((L, D, I)),
        "down_w": qrand((L, I, D)),
    }
    text = {
        "embed": (jax.random.normal(next(ks), (V, D), jnp.float32) * 0.02).astype(dtype),
        "layers": layers,
        "final_ln": jnp.ones((D,), dtype),
    }
    if tcfg.tie_word_embeddings:
        text["lm_head_q"] = qrand((D, V))
    else:
        text["lm_head"] = qrand((D, V))
    vparams = vision_mod.init_vision_params(cfg.vision, next(ks), dtype)
    return {"vision": quantize_vision_params(vparams, donate=True), "text": text}


def quantize_model_params(
    params: Params, *, donate: bool = False, text_bits: int = 8
) -> Params:
    """Quantize a full VLM parameter tree ({"vision", "text"}). The vision
    tower stays int8 regardless of `text_bits` — it is compute-bound (near
    bf16-MXU roofline at the default grid), so int4's extra unpack work would
    cost more than its traffic saving buys."""
    return {
        "vision": quantize_vision_params(params["vision"], donate=donate),
        "text": quantize_language_params(params["text"], donate=donate, bits=text_bits),
    }
