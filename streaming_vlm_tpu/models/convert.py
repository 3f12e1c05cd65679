"""HF Qwen2.5-VL checkpoint -> streaming-vlm-tpu parameter pytree.

Supports both a live torch `state_dict()` (used by the parity tests) and
safetensors files on disk. Handles the two HF module layouts:
  * transformers >= 4.52: `model.language_model.*`, `model.visual.*`
  * older:                `model.*` (text), `visual.*`
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().to("cpu").float().numpy()


def _normalise_keys(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Map any HF layout to canonical 'text.*' / 'visual.*' / 'lm_head' keys."""
    out = {}
    for k, v in sd.items():
        nk = k
        for prefix in ("model.language_model.", "language_model.model.", "language_model."):
            if nk.startswith(prefix):
                nk = "text." + nk[len(prefix):]
                break
        else:
            if nk.startswith("model.visual."):
                nk = "visual." + nk[len("model.visual."):]
            elif nk.startswith("visual."):
                pass
            elif nk.startswith("model."):
                nk = "text." + nk[len("model."):]
        out[nk] = v
    return out


def params_from_state_dict(
    cfg: ModelConfig, sd: Mapping[str, Any], dtype=jnp.bfloat16
) -> Dict[str, Any]:
    sd = _normalise_keys(sd)
    t = cfg.text
    v = cfg.vision
    L = t.num_hidden_layers

    def get(name):
        return _np(sd[name])

    def stack_text(fmt, transpose=False):
        mats = [get(fmt.format(i)) for i in range(L)]
        arr = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(arr, dtype)

    text = {
        "embed": jnp.asarray(get("text.embed_tokens.weight"), dtype),
        "layers": {
            "input_ln": stack_text("text.layers.{}.input_layernorm.weight"),
            "q_w": stack_text("text.layers.{}.self_attn.q_proj.weight", True),
            "q_b": stack_text("text.layers.{}.self_attn.q_proj.bias"),
            "k_w": stack_text("text.layers.{}.self_attn.k_proj.weight", True),
            "k_b": stack_text("text.layers.{}.self_attn.k_proj.bias"),
            "v_w": stack_text("text.layers.{}.self_attn.v_proj.weight", True),
            "v_b": stack_text("text.layers.{}.self_attn.v_proj.bias"),
            "o_w": stack_text("text.layers.{}.self_attn.o_proj.weight", True),
            "post_ln": stack_text("text.layers.{}.post_attention_layernorm.weight"),
            "gate_w": stack_text("text.layers.{}.mlp.gate_proj.weight", True),
            "up_w": stack_text("text.layers.{}.mlp.up_proj.weight", True),
            "down_w": stack_text("text.layers.{}.mlp.down_proj.weight", True),
        },
        "final_ln": jnp.asarray(get("text.norm.weight"), dtype),
    }
    if not t.tie_word_embeddings:
        text["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)

    Lv = v.depth

    def stack_vis(fmt, transpose=False):
        mats = [get(fmt.format(i)) for i in range(Lv)]
        arr = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(arr, dtype)

    patch_w = get("visual.patch_embed.proj.weight")  # [D, C, tps, ps, ps]
    blocks = {
        "norm1": stack_vis("visual.blocks.{}.norm1.weight"),
        "norm2": stack_vis("visual.blocks.{}.norm2.weight"),
        "qkv_w": stack_vis("visual.blocks.{}.attn.qkv.weight", True),
        "qkv_b": stack_vis("visual.blocks.{}.attn.qkv.bias"),
        "proj_w": stack_vis("visual.blocks.{}.attn.proj.weight", True),
        "proj_b": stack_vis("visual.blocks.{}.attn.proj.bias"),
    }
    merger = {
        "fc1_w": jnp.asarray(get("visual.merger.mlp.0.weight").T, dtype),
        "fc1_b": jnp.asarray(get("visual.merger.mlp.0.bias"), dtype),
        "fc2_w": jnp.asarray(get("visual.merger.mlp.2.weight").T, dtype),
        "fc2_b": jnp.asarray(get("visual.merger.mlp.2.bias"), dtype),
        "ln_q": jnp.asarray(get("visual.merger.ln_q.weight"), dtype),
    }
    if v.variant == "qwen2_5":
        blocks.update(
            {
                "gate_w": stack_vis("visual.blocks.{}.mlp.gate_proj.weight", True),
                "gate_b": stack_vis("visual.blocks.{}.mlp.gate_proj.bias"),
                "up_w": stack_vis("visual.blocks.{}.mlp.up_proj.weight", True),
                "up_b": stack_vis("visual.blocks.{}.mlp.up_proj.bias"),
                "down_w": stack_vis("visual.blocks.{}.mlp.down_proj.weight", True),
                "down_b": stack_vis("visual.blocks.{}.mlp.down_proj.bias"),
            }
        )
    else:  # qwen2: LayerNorm biases + fc1/fc2 MLP
        blocks.update(
            {
                "norm1_b": stack_vis("visual.blocks.{}.norm1.bias"),
                "norm2_b": stack_vis("visual.blocks.{}.norm2.bias"),
                "fc1_w": stack_vis("visual.blocks.{}.mlp.fc1.weight", True),
                "fc1_b": stack_vis("visual.blocks.{}.mlp.fc1.bias"),
                "fc2_w": stack_vis("visual.blocks.{}.mlp.fc2.weight", True),
                "fc2_b": stack_vis("visual.blocks.{}.mlp.fc2.bias"),
            }
        )
        merger["ln_q_b"] = jnp.asarray(get("visual.merger.ln_q.bias"), dtype)
    visual = {
        "patch_embed": jnp.asarray(patch_w.reshape(patch_w.shape[0], -1).T, dtype),
        "blocks": blocks,
        "merger": merger,
    }
    return {"vision": visual, "text": text}


def load_safetensors_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors shards in a HF model directory into numpy."""
    from safetensors import safe_open  # ships with transformers' deps

    sd: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    for f in files:
        with safe_open(f, framework="np") as fh:
            for k in fh.keys():
                sd[k] = fh.get_tensor(k)
    return sd


def config_from_hf_dir(model_dir: str) -> ModelConfig:
    """Build a ModelConfig from a HF config.json."""
    from ..config import ModelConfig, TextConfig, VisionConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    vis = raw.get("vision_config", {})
    is_qwen2 = raw.get("model_type") == "qwen2_vl"
    # transformers >= 4.52 re-saves the composite config with the text
    # fields nested under 'text_config' (and weights under
    # model.language_model.*, which params_from_state_dict already maps);
    # older checkpoints keep them flat. Text fields resolve from the nested
    # dict first, falling back to flat top-level keys.
    hf = {**raw, **raw.get("text_config", {})}
    text_kw = dict(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf["num_key_value_heads"],
        head_dim=hf.get("head_dim", hf["hidden_size"] // hf["num_attention_heads"]),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        rope_theta=hf.get("rope_theta", 1e6),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )
    if hf.get("rope_scaling") and "mrope_section" in hf["rope_scaling"]:
        text_kw["mrope_section"] = tuple(hf["rope_scaling"]["mrope_section"])
    if is_qwen2:
        d = vis.get("embed_dim", 1280)
        vis_kw = dict(
            variant="qwen2",
            depth=vis.get("depth", 32),
            hidden_size=d,
            intermediate_size=int(d * vis.get("mlp_ratio", 4)),
            num_heads=vis.get("num_heads", 16),
            spatial_merge_size=vis.get("spatial_merge_size", 2),
            patch_size=vis.get("patch_size", 14),
            temporal_patch_size=vis.get("temporal_patch_size", 2),
            out_hidden_size=vis.get("hidden_size", hf["hidden_size"]),
            tokens_per_second=1,
        )
    else:
        vis_kw = dict(
            depth=vis.get("depth", 32),
            hidden_size=vis.get("hidden_size", 1280),
            intermediate_size=vis.get("intermediate_size", 3420),
            num_heads=vis.get("num_heads", 16),
            window_size=vis.get("window_size", 112),
            fullatt_block_indexes=tuple(vis.get("fullatt_block_indexes", (7, 15, 23, 31))),
            spatial_merge_size=vis.get("spatial_merge_size", 2),
            patch_size=vis.get("patch_size", 14),
            temporal_patch_size=vis.get("temporal_patch_size", 2),
            out_hidden_size=vis.get("out_hidden_size", hf["hidden_size"]),
            tokens_per_second=vis.get("tokens_per_second", 2),
        )
    return ModelConfig(
        name="qwen2_vl_hf" if is_qwen2 else "qwen2_5_vl_hf",
        vision=VisionConfig(**vis_kw),
        text=TextConfig(**text_kw),
    )


def load_hf_checkpoint(model_dir: str, dtype=jnp.bfloat16):
    """Load (cfg, params) from a HF Qwen2.5-VL directory."""
    cfg = config_from_hf_dir(model_dir)
    sd = load_safetensors_state_dict(model_dir)
    return cfg, params_from_state_dict(cfg, sd, dtype)


# ---------------------------------------------------------------------------
# Serving checkpoints: one-time HF -> (optionally pre-quantized) msgpack
# ---------------------------------------------------------------------------


def _tupled(d: Dict[str, Any]) -> Dict[str, Any]:
    """JSON round-trip turns tuples into lists; dataclass fields that are
    tuples (mrope_section, fullatt_block_indexes, previous_text) want them
    back."""
    return {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}


def save_serving_checkpoint(out_dir: str, cfg: ModelConfig, params, *,
                            quant: str = "int8") -> None:
    """One-time conversion to a fast-cold-start serving checkpoint: a config
    JSON + one msgpack parameter blob, pre-quantized when quant="int8"
    (the serving default, ops/quant.py W8A8 trees) so startup skips both
    the multi-file safetensors read/convert and the quantization pass the
    reference pays per process (from_pretrained at inference.py:70-85).
    Typical use: load_hf_checkpoint(hf_dir) -> save_serving_checkpoint."""
    import dataclasses

    import jax
    from flax import serialization

    from ..ops.quant import quantize_model_params

    if quant == "int8":
        params = quantize_model_params(params)
    elif quant != "none":
        raise ValueError(f"quant must be 'int8' or 'none', got {quant!r}")
    os.makedirs(out_dir, exist_ok=True)
    meta = {
        "format": 1,
        "quant": quant,
        "config": {
            "name": cfg.name,
            "dtype": cfg.dtype,
            "vision": dataclasses.asdict(cfg.vision),
            "text": dataclasses.asdict(cfg.text),
            "tokens": dataclasses.asdict(cfg.tokens),
        },
    }
    with open(os.path.join(out_dir, "serving_config.json"), "w") as f:
        json.dump(meta, f, indent=1)
    host = jax.tree_util.tree_map(np.asarray, params)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(host))


def load_serving_checkpoint(out_dir: str):
    """Load (cfg, params, quant) saved by save_serving_checkpoint. Params
    come back as device arrays in their stored dtypes (int8 {q,s} trees for
    a quantized checkpoint — mm() dispatches on the representation)."""
    import jax
    from flax import serialization

    from ..config import SpecialTokens, TextConfig, VisionConfig

    with open(os.path.join(out_dir, "serving_config.json")) as f:
        meta = json.load(f)
    assert meta["format"] == 1, meta["format"]
    c = meta["config"]
    cfg = ModelConfig(
        name=c["name"],
        dtype=c["dtype"],
        vision=VisionConfig(**_tupled(c["vision"])),
        text=TextConfig(**_tupled(c["text"])),
        tokens=SpecialTokens(**_tupled(c["tokens"])),
    )
    with open(os.path.join(out_dir, "params.msgpack"), "rb") as f:
        host = serialization.msgpack_restore(f.read())
    params = jax.tree_util.tree_map(jnp.asarray, host)
    return cfg, params, meta["quant"]
