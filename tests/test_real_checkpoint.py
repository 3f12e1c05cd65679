"""Real-checkpoint acceptance smoke (docs/REAL_CHECKPOINT_RUNBOOK.md).

This image has no HF checkpoint, so these tests are GATED: they run when
`SVT_CHECKPOINT` points at an HF Qwen2.5-VL directory (config.json +
safetensors + tokenizer) and skip cleanly otherwise. The day a checkpoint
is available, acceptance is one command:

    SVT_CHECKPOINT=/ckpt/svlm python -m pytest tests/test_real_checkpoint.py \
        -q -m requires_checkpoint

Covers: (1) full-size logit parity vs the HF forward (the load is right),
(2) deterministic bounded streaming over a synthesized clip (the serve loop
is right), (3) optionally (SVT_DIFF_FULLSIZE=1, needs ~4x model RAM) the
full reference differential at checkpoint size.
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("SVT_CHECKPOINT")

pytestmark = [
    pytest.mark.requires_checkpoint,
    pytest.mark.skipif(
        not (CKPT and os.path.isdir(CKPT)),
        reason="SVT_CHECKPOINT not set to an HF checkpoint dir",
    ),
]


@pytest.fixture(scope="module")
def loaded():
    import jax.numpy as jnp  # noqa: F401

    from streaming_vlm_tpu.cli import load_model

    cfg, params, tokenizer, dtype = load_model(CKPT, dtype_name="float32")
    return cfg, params, tokenizer


def test_full_size_logit_parity_vs_hf(loaded):
    """Our forward == the HF forward on a text prompt at checkpoint size
    (the full-size instantiation of tests/test_model_parity.py)."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import AutoModelForVision2Seq

    from streaming_vlm_tpu.models.qwen25_vl import language

    cfg, params, tokenizer = loaded
    hf = AutoModelForVision2Seq.from_pretrained(CKPT, torch_dtype=torch.float32)
    hf = hf.eval()

    ids = tokenizer("The quick brown fox jumps over the lazy dog.")["input_ids"]
    ids = np.asarray(ids, np.int32)[:64]
    T = len(ids)
    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor(ids, dtype=torch.long)[None]
        ).logits[0].float().numpy()

    with jax.default_matmul_precision("highest"):
        emb = language.embed_tokens(cfg.text, params["text"], jnp.asarray(ids))
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32), (3, T))
        hidden = language.language_forward(cfg.text, params["text"], emb, pos)
        ours = np.asarray(language.lm_logits(cfg.text, params["text"], hidden))

    np.testing.assert_allclose(ours, hf_logits, atol=3e-3, rtol=2e-3)


def test_streaming_deterministic_and_bounded(loaded, tmp_path):
    """Greedy streaming over a synthesized clip: two runs byte-identical,
    KV occupancy bounded once the window fills."""
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import SamplingConfig, StreamConfig
    from streaming_vlm_tpu.serve import streaming_inference
    from streaming_vlm_tpu.video import ingest

    cfg, params, tokenizer = loaded
    clip = str(tmp_path / "clip.mp4")
    ingest.build_native()
    ingest.write_test_video(clip, w=256, h=144, n_frames=160, fps=8)

    stream = StreamConfig(window_size=4, text_round=4, kv_capacity=8192)
    sampling = SamplingConfig(do_sample=False)

    def run(out):
        return streaming_inference(
            cfg=cfg, params=params, tokenizer=tokenizer, video_path=clip,
            output_dir=str(tmp_path / out), stream=stream, sampling=sampling,
            duration=12.0, emit_json=False, dtype=jnp.bfloat16,
        )

    r1 = run("a.vtt")
    r2 = run("b.vtt")
    t1 = (tmp_path / "a.vtt").read_text()
    t2 = (tmp_path / "b.vtt").read_text()
    assert t1 == t2, "greedy streaming must be deterministic"
    assert t1.strip(), "transcript must be non-empty"
    del r1, r2


@pytest.mark.skipif(
    os.environ.get("SVT_DIFF_FULLSIZE") != "1",
    reason="SVT_DIFF_FULLSIZE=1 required (torch f32 + jax copies of the full model)",
)
def test_differential_vs_reference_full_size(loaded):
    """The tests/test_reference_differential.py harness at checkpoint size:
    the reference's own torch streaming loop vs this engine with the SAME
    real weights — per-chunk greedy tokens / ids / occupancy / positions."""
    import torch
    from transformers import AutoModelForVision2Seq

    import test_reference_differential as diff

    cfg, params, _tok = loaded
    hf = AutoModelForVision2Seq.from_pretrained(CKPT, torch_dtype=torch.float32)
    hf = hf.eval()
    # the same patch + shim pipeline the tiny fixture applies
    from types import MethodType

    from streaming_vlm.inference.qwen2_5.language_forward import (
        streaming_text_eager_attn_forward,
    )
    from streaming_vlm.inference.qwen2_5.patch_model import (
        convert_qwen2_5_to_streaming,
    )

    from _reference_compat import patch_generation_compat

    stock_visual_forward = type(hf.model.visual).forward
    hf = convert_qwen2_5_to_streaming(hf)
    for layer in hf.model.language_model.layers:
        layer.self_attn.forward = MethodType(
            streaming_text_eager_attn_forward, layer.self_attn
        )
        if not hasattr(layer.self_attn, "rope_scaling"):
            layer.self_attn.rope_scaling = hf.config.text_config.rope_scaling
    hf.model.visual.forward = MethodType(stock_visual_forward, hf.model.visual)
    for blk in hf.model.visual.blocks:
        blk.forward = MethodType(type(blk).forward, blk)
        blk.attn.forward = MethodType(type(blk.attn).forward, blk.attn)
    patch_generation_compat(hf)

    # swap the module-level CFG for the checkpoint's geometry, then drive
    old_cfg = diff.CFG
    diff.CFG = cfg
    try:
        diff._drive_differential(
            hf, params, n_chunks=4, text_round=2, visual_round=2,
            sink=4, window=3, cfg=cfg,
        )
    finally:
        diff.CFG = old_cfg
