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


def is_qtensor(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


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
    """Matmul that dispatches on the weight's representation: QTensor dict ->
    dynamic W8A8 path, plain array -> jnp.dot. The single seam through which
    every language-model weight is applied (quantization is a parameter-tree
    transform, not a model rewrite)."""
    if is_qtensor(w):
        return qdot(x, w, out_dtype=out_dtype)
    r = jnp.dot(x, w, preferred_element_type=out_dtype) if out_dtype else jnp.dot(x, w)
    return r


def quantize_language_params(params_text: Params, *, donate: bool = False) -> Params:
    """Quantize the decoder-layer weights + lm_head of a language-model
    parameter tree (models/qwen25_vl/language.py layout). Keeps embed /
    biases / norms in their original dtype; tied embeddings get a separate
    quantized lm_head copy ("lm_head_q") while the bf16 embedding table stays
    for token gathers. `donate=True` frees each bf16 weight as it is
    converted (halves peak HBM during conversion; the input tree becomes
    unusable)."""
    out = dict(params_text)
    layers = dict(params_text["layers"])
    for k in LAYER_WEIGHTS:
        layers[k] = quantize_weight(layers[k], contract_axis=-2, donate=donate)
    out["layers"] = layers
    if "lm_head" in params_text:
        out["lm_head"] = quantize_weight(
            params_text["lm_head"], contract_axis=-2, donate=donate
        )
    else:  # tied embeddings: quantize embed.T for the logits projection
        out["lm_head_q"] = quantize_weight(
            params_text["embed"].T, contract_axis=-2
        )
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


def quantize_model_params(params: Params, *, donate: bool = False) -> Params:
    """Quantize a full VLM parameter tree ({"vision", "text"})."""
    return {
        "vision": quantize_vision_params(params["vision"], donate=donate),
        "text": quantize_language_params(params["text"], donate=donate),
    }
