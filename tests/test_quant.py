"""int8 W8A8 quantization tests: numeric accuracy of the dynamic-quantized
matmul, logit fidelity of a quantized tiny model, and full streaming
equivalence (engine vs reference-semantics oracle) in the quantized config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import language, model
from streaming_vlm_tpu.ops.quant import (
    mm,
    qdot,
    quantize_language_params,
    quantize_weight,
)

CFG = qwen25_vl_tiny()


def quantize_params(params):
    return {"vision": params["vision"], "text": quantize_language_params(params["text"])}


def test_qdot_accuracy():
    k = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(k)
    x = jax.random.normal(kx, (16, 256), jnp.float32)
    w = jax.random.normal(kw, (256, 512), jnp.float32) * 0.02
    exact = x @ w
    approx = qdot(x, quantize_weight(w), out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(approx - exact) / jnp.linalg.norm(exact))
    assert rel < 0.02, rel  # ~1% W8A8 noise


def test_qdot_outlier_rows():
    # per-row activation scales: an outlier row must not destroy other rows
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (4, 128), jnp.float32)
    x = x.at[0].multiply(1000.0)
    w = jax.random.normal(jax.random.PRNGKey(2), (128, 64), jnp.float32)
    exact = x @ w
    approx = qdot(x, quantize_weight(w), out_dtype=jnp.float32)
    for r in range(4):
        rel = float(
            jnp.linalg.norm(approx[r] - exact[r]) / jnp.linalg.norm(exact[r])
        )
        assert rel < 0.03, (r, rel)


def test_quantized_logit_fidelity():
    """Full-attention forward with quantized weights: logits stay close and
    greedy decisions overwhelmingly agree with the f32 model."""
    params = model.init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    qparams = quantize_params(params)
    ids = np.arange(40) % 900 + 30
    full = np.asarray(model.forward_full(CFG, params, ids))
    quant = np.asarray(model.forward_full(CFG, qparams, ids))
    rel = np.linalg.norm(quant - full) / np.linalg.norm(full)
    assert rel < 0.05, rel
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_streaming_quantized_matches_oracle():
    """Streaming equivalence holds in the quantized config: the engine's
    arena path and the reference-semantics oracle (both quantized) produce
    identical greedy generations through evictions/relocation/sink-window."""
    from tests.test_streaming import drive

    params = model.init_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
    qparams = quantize_params(params)
    drive(qparams, n_chunks=7, text_round=2, visual_round=2, sink=4, window=3,
          max_new=8)


def test_quantized_weight_memory_halves():
    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qtext = quantize_language_params(params["text"])

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))

    orig_layers = nbytes(params["text"]["layers"])
    q_layers = nbytes(qtext["layers"])
    assert q_layers < 0.75 * orig_layers  # int8 + f32 scales vs bf16


def test_quantized_vision_fidelity():
    """Quantized ViT + LM multimodal forward stays close to f32."""
    from streaming_vlm_tpu.ops.quant import quantize_model_params

    params = model.init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    qp = quantize_model_params(params)
    rng = np.random.default_rng(0)
    grid = (1, 4, 4)
    pd = (
        CFG.vision.in_channels
        * CFG.vision.temporal_patch_size
        * CFG.vision.patch_size**2
    )
    pix = rng.normal(size=(16, pd)).astype(np.float32) * 0.1
    t = CFG.tokens
    ids = np.array([t.im_start, 50, t.vision_start] + [t.video_pad] * 4
                   + [t.vision_end, 60, 61, t.im_end], np.int32)
    kw = dict(pixel_patches=jnp.asarray(pix), video_grid_thw=np.array([list(grid)]),
              second_per_grid_ts=[1.0])
    full = np.asarray(model.forward_full(CFG, params, ids, **kw))
    quant = np.asarray(model.forward_full(CFG, qp, ids, **kw))
    rel = np.linalg.norm(quant - full) / np.linalg.norm(full)
    assert rel < 0.05, rel
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.85, agree
