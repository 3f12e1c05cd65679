"""Logit parity vs transformers' Qwen2.5-VL on tiny random models (float32).

This is the acceptance gate for the model port: same weights, same inputs
=> same logits (atol ~1e-4 in float32 on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from streaming_vlm_tpu.config import qwen25_vl_tiny
from streaming_vlm_tpu.models.convert import params_from_state_dict
from streaming_vlm_tpu.models.qwen25_vl import language, model

CFG = qwen25_vl_tiny()
TOK = CFG.tokens


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    t = CFG.text
    v = CFG.vision
    hf_cfg = Qwen2_5_VLConfig(
        vocab_size=t.vocab_size,
        hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads,
        rms_norm_eps=t.rms_norm_eps,
        rope_theta=t.rope_theta,
        tie_word_embeddings=t.tie_word_embeddings,
        vision_config=dict(
            depth=v.depth,
            hidden_size=v.hidden_size,
            intermediate_size=v.intermediate_size,
            num_heads=v.num_heads,
            in_channels=v.in_channels,
            patch_size=v.patch_size,
            temporal_patch_size=v.temporal_patch_size,
            spatial_merge_size=v.spatial_merge_size,
            window_size=v.window_size,
            fullatt_block_indexes=list(v.fullatt_block_indexes),
            out_hidden_size=v.out_hidden_size,
            tokens_per_second=v.tokens_per_second,
            hidden_act="silu",
        ),
        rope_scaling=dict(type="mrope", mrope_section=list(t.mrope_section)),
        attn_implementation="sdpa",
    )
    hf_cfg.image_token_id = TOK.image_pad
    hf_cfg.video_token_id = TOK.video_pad
    hf_cfg.vision_start_token_id = TOK.vision_start

    torch.manual_seed(0)
    m = Qwen2_5_VLForConditionalGeneration(hf_cfg)
    m = m.eval().float()
    return m


@pytest.fixture(scope="module")
def jax_params(hf_model):
    return params_from_state_dict(CFG, hf_model.state_dict(), dtype=jnp.float32)


def test_text_only_parity(hf_model, jax_params):
    import torch

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 900, size=33)

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
        )
    hf_logits = out.logits[0].numpy()

    ours = np.asarray(model.forward_full(CFG, jax_params, ids))
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("grid", [(2, 4, 6), (1, 8, 8)])
def test_vision_tower_parity(hf_model, jax_params, grid):
    import torch

    v = CFG.vision
    t_g, h, w = grid
    S = t_g * h * w
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size**2
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(S, patch_dim)).astype(np.float32)

    with torch.no_grad():
        hf_out = hf_model.model.visual(
            torch.tensor(pixels), grid_thw=torch.tensor([list(grid)])
        ).numpy()

    ours = np.asarray(
        model.encode_video(CFG, jax_params, jnp.asarray(pixels), (grid,))
    )
    np.testing.assert_allclose(ours, hf_out, atol=2e-4, rtol=2e-3)


def test_multimodal_parity(hf_model, jax_params):
    import torch

    v = CFG.vision
    grid = (2, 4, 6)
    t_g, h, w = grid
    S = t_g * h * w
    n_llm_tokens = S // v.spatial_merge_unit
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size**2

    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(S, patch_dim)).astype(np.float32)
    pre = rng.integers(5, 900, size=7).tolist()
    post = rng.integers(5, 900, size=5).tolist()
    ids = np.array(
        pre + [TOK.vision_start] + [TOK.video_pad] * n_llm_tokens + [TOK.vision_end] + post
    )

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values_videos=torch.tensor(pixels),
            video_grid_thw=torch.tensor([list(grid)]),
            second_per_grid_ts=torch.tensor([1.0]),
        )
    hf_logits = out.logits[0].numpy()

    ours = np.asarray(
        model.forward_full(
            CFG,
            jax_params,
            ids,
            pixel_patches=jnp.asarray(pixels),
            video_grid_thw=np.array([list(grid)]),
            second_per_grid_ts=np.array([1.0]),
        )
    )
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=2e-3)


def test_qwen2_vl_multimodal_parity():
    """Qwen2-VL (non-2.5) variant: LayerNorm ViT, quick-GELU MLP, no windows."""
    import torch
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLForConditionalGeneration,
    )

    from streaming_vlm_tpu.config import qwen2_vl_tiny

    cfg2 = qwen2_vl_tiny()
    t, v = cfg2.text, cfg2.vision
    hf_cfg = Qwen2VLConfig(
        vocab_size=t.vocab_size,
        hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads,
        rms_norm_eps=t.rms_norm_eps,
        rope_theta=t.rope_theta,
        tie_word_embeddings=t.tie_word_embeddings,
        vision_config=dict(
            depth=v.depth,
            embed_dim=v.hidden_size,
            mlp_ratio=v.intermediate_size / v.hidden_size,
            num_heads=v.num_heads,
            in_channels=v.in_channels,
            patch_size=v.patch_size,
            temporal_patch_size=v.temporal_patch_size,
            spatial_merge_size=v.spatial_merge_size,
            hidden_size=v.out_hidden_size,
        ),
        rope_scaling=dict(type="mrope", mrope_section=list(t.mrope_section)),
        attn_implementation="sdpa",
    )
    hf_cfg.image_token_id = cfg2.tokens.image_pad
    hf_cfg.video_token_id = cfg2.tokens.video_pad
    hf_cfg.vision_start_token_id = cfg2.tokens.vision_start

    torch.manual_seed(1)
    m = Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    jp = params_from_state_dict(cfg2, m.state_dict(), dtype=jnp.float32)

    grid = (2, 4, 6)
    S = int(np.prod(grid))
    n_llm = S // v.spatial_merge_unit
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size**2
    rng = np.random.default_rng(5)
    pixels = rng.normal(size=(S, patch_dim)).astype(np.float32)
    TOK2 = cfg2.tokens
    ids = np.array(
        rng.integers(5, 900, size=6).tolist()
        + [TOK2.vision_start] + [TOK2.video_pad] * n_llm + [TOK2.vision_end]
        + rng.integers(5, 900, size=4).tolist()
    )

    with torch.no_grad():
        out = m(
            input_ids=torch.tensor(ids)[None],
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values_videos=torch.tensor(pixels),
            video_grid_thw=torch.tensor([list(grid)]),
        )
    hf_logits = out.logits[0].numpy()

    ours = np.asarray(
        model.forward_full(
            cfg2,
            jp,
            ids,
            pixel_patches=jnp.asarray(pixels),
            video_grid_thw=np.array([list(grid)]),
            second_per_grid_ts=[1.0],
        )
    )
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=2e-3)


def test_serving_checkpoint_roundtrip(hf_model, jax_params, tmp_path):
    """save_serving_checkpoint/load_serving_checkpoint: the pre-converted
    msgpack path reproduces the exact parameter tree (unquantized) or the
    exact quantize_model_params tree (int8), and its forward matches."""
    import jax

    from streaming_vlm_tpu.models.convert import (
        load_serving_checkpoint,
        save_serving_checkpoint,
    )
    from streaming_vlm_tpu.models.qwen25_vl import model as m
    from streaming_vlm_tpu.ops.quant import quantize_model_params

    ids = np.arange(24) % 900 + 30
    base = np.asarray(m.forward_full(CFG, jax_params, ids))

    d_none = str(tmp_path / "srv_none")
    save_serving_checkpoint(d_none, CFG, jax_params, quant="none")
    cfg2, p2, q2 = load_serving_checkpoint(d_none)
    assert q2 == "none" and cfg2.text == CFG.text and cfg2.vision == CFG.vision
    flat1, t1 = jax.tree_util.tree_flatten_with_path(jax_params)
    flat2, t2 = jax.tree_util.tree_flatten_with_path(p2)
    assert t1 == t2
    for (k1, a1), (k2, a2) in zip(flat1, flat2):
        assert k1 == k2 and a1.dtype == a2.dtype
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(m.forward_full(cfg2, p2, ids)), base)

    d_int8 = str(tmp_path / "srv_int8")
    save_serving_checkpoint(d_int8, CFG, jax_params, quant="int8")
    cfg3, p3, q3 = load_serving_checkpoint(d_int8)
    assert q3 == "int8"
    ref_q = quantize_model_params(jax_params)
    flatq, tq = jax.tree_util.tree_flatten_with_path(ref_q)
    flat3, t3 = jax.tree_util.tree_flatten_with_path(p3)
    assert tq == t3
    for (k1, a1), (k2, a2) in zip(flatq, flat3):
        assert k1 == k2 and a1.dtype == a2.dtype
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(
        np.asarray(m.forward_full(cfg3, p3, ids)),
        np.asarray(m.forward_full(CFG, ref_q, ids)),
    )


def test_load_hf_checkpoint_from_disk(hf_model, jax_params, tmp_path):
    """The safetensors-on-disk path (reference inference.py:70-85): save the
    tiny HF model with save_pretrained, then load_hf_checkpoint must rebuild
    the exact same config + parameter tree as the live-state-dict converter,
    and produce HF-parity logits."""
    import dataclasses

    import torch

    from streaming_vlm_tpu.models.convert import load_hf_checkpoint

    d = str(tmp_path / "tiny_hf")
    hf_model.save_pretrained(d, safe_serialization=True)
    import os

    assert any(f.endswith(".safetensors") for f in os.listdir(d))

    cfg2, params2 = load_hf_checkpoint(d, dtype=jnp.float32)

    # config round-trips (identity fields like name/tokens aside)
    assert dataclasses.replace(cfg2.text) == CFG.text
    assert dataclasses.replace(cfg2.vision) == CFG.vision

    # parameter trees are identical to the live-state-dict conversion
    import jax

    flat1, tree1 = jax.tree_util.tree_flatten_with_path(jax_params)
    flat2, tree2 = jax.tree_util.tree_flatten_with_path(params2)
    assert tree1 == tree2
    for (p1, a1), (p2, a2) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2), err_msg=str(p1))

    # and the loaded tree produces HF-parity logits on a text prompt
    from streaming_vlm_tpu.models.qwen25_vl import model as m

    ids = np.arange(24) % 900 + 30
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids[None]), use_cache=False
        ).logits[0].numpy()
    ours = np.asarray(m.forward_full(cfg2, params2, ids))
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


def test_config_from_hf_dir_nested_text_config(hf_model, tmp_path):
    """transformers >= 4.52 re-saves the composite config with the text
    fields nested under 'text_config'; config_from_hf_dir must parse both
    layouts to the same ModelConfig."""
    import json as _json
    import os as _os

    from streaming_vlm_tpu.models.convert import config_from_hf_dir

    d = str(tmp_path / "flat")
    hf_model.save_pretrained(d, safe_serialization=True)
    with open(_os.path.join(d, "config.json")) as f:
        flat = _json.load(f)
    cfg_flat = config_from_hf_dir(d)

    text_keys = (
        "vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers",
        "num_attention_heads", "num_key_value_heads", "head_dim",
        "rms_norm_eps", "rope_theta", "tie_word_embeddings", "rope_scaling",
    )
    nested = {k: v for k, v in flat.items() if k not in text_keys}
    nested["text_config"] = {k: flat[k] for k in text_keys if k in flat}
    d2 = str(tmp_path / "nested")
    _os.makedirs(d2)
    with open(_os.path.join(d2, "config.json"), "w") as f:
        _json.dump(nested, f)
    cfg_nested = config_from_hf_dir(d2)
    assert cfg_nested == cfg_flat
