"""Device mesh + sharding rules.

Replaces the reference's NCCL/DeepSpeed layer (SURVEY.md §2b): ZeRO-3 becomes
FSDP-style parameter sharding over a ('data', 'model') mesh with XLA GSPMD
inserting the collectives; eval fan-out becomes batch sharding over 'data'.
Reference evidence: scripts/zero3.json:16-27, scripts/sft_stage_1.sh:45.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Dict[str, int], devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    axes = tuple(shape.keys())
    dims = tuple(shape.values())
    n = int(np.prod(dims))
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(dims)
    return Mesh(dev, axes)


# Text-model tensor-parallel + FSDP rules. Keys are regexes over the param
# tree path ("layers/q_w" etc.); values are PartitionSpecs. Layer-stacked
# leaves have a leading layer axis (None).
TEXT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: shard heads (last dim of q/k/v, first matmul dim of o)
    (r"layers/q_w$", P(None, "data", "model")),
    (r"layers/q_b$", P(None, "model")),
    (r"layers/[kv]_w$", P(None, "data", "model")),
    (r"layers/[kv]_b$", P(None, "model")),
    (r"layers/o_w$", P(None, "model", "data")),
    # mlp: shard intermediate dim
    (r"layers/(gate|up)_w$", P(None, "data", "model")),
    (r"layers/down_w$", P(None, "model", "data")),
    (r"layers/(input|post)_ln$", P(None)),
    # embeddings / head: shard vocab
    (r"embed$", P("model", "data")),
    (r"lm_head$", P("data", "model")),
    (r"final_ln$", P()),
)

VISION_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"blocks/qkv_w$", P(None, "data", "model")),
    (r"blocks/qkv_b$", P(None, "model")),
    (r"blocks/proj_w$", P(None, "model", "data")),
    (r"blocks/proj_b$", P(None)),
    (r"blocks/(gate|up)_w$", P(None, "data", "model")),
    (r"blocks/(gate|up)_b$", P(None, "model")),
    (r"blocks/down_w$", P(None, "model", "data")),
    (r"blocks/down_b$", P(None)),
    (r"blocks/norm[12]$", P(None)),
    (r"patch_embed$", P("data", "model")),
    (r"merger/fc1_w$", P(None, "model")),
    (r"merger/fc1_b$", P("model")),
    (r"merger/fc2_w$", P("model", None)),
    (r"merger/(fc2_b|ln_q)$", P()),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def sharding_for_tree(
    params: Any, mesh: Mesh, rules: Sequence[Tuple[str, P]]
) -> Any:
    """Build a NamedSharding tree matching `params` by regex rules. Any
    unmatched leaf is replicated. Specs whose sharded dims don't divide the
    leaf shape fall back to replication on the offending axes."""

    def one(path, leaf):
        ps = None
        s = _path_str(path)
        # quantized trees (ops/quant.py) wrap each weight as {"q","s"}; the
        # rules address the weight path — match it with the suffix stripped
        # (the int8 "q" has the weight's shape; the "s" scales keep dims of 1
        # on the contracted axis, which the divisibility fallback replicates)
        s = re.sub(r"/(q|s)$", "", s)
        for pat, spec in rules:
            if re.search(pat, s):
                ps = spec
                break
        if ps is None:
            return NamedSharding(mesh, P())
        # sanity: drop axes that don't divide
        fixed = []
        for dim, axis in zip(leaf.shape, tuple(ps) + (None,) * (len(leaf.shape) - len(ps))):
            if axis is None:
                fixed.append(None)
            else:
                size = mesh.shape[axis] if isinstance(axis, str) else int(
                    np.prod([mesh.shape[a] for a in axis])
                )
                fixed.append(axis if dim % size == 0 else None)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a full model param tree (vision + text) on the mesh."""
    shardings = {
        "vision": sharding_for_tree(params["vision"], mesh, VISION_TP_RULES),
        "text": sharding_for_tree(params["text"], mesh, TEXT_TP_RULES),
    }
    return jax.device_put(params, shardings), shardings


def arena_sharding(mesh: Mesh, kv_heads: int, *, batched: bool = False) -> NamedSharding:
    """Sharding for the streaming KV arena [L, C, Hkv, hd] (or the
    multi-stream stacked [B, L, C, Hkv, hd] with batched=True): split KV
    heads over the 'model' axis (each device holds its attention heads'
    cache — the multi-chip streaming-cache layout; 7B: 4 kv heads on a
    model=4 mesh axis). Falls back to replication when Hkv doesn't divide."""
    m = int(mesh.shape.get("model", 1))
    if m > 1 and kv_heads % m == 0:
        spec = (None,) * (3 if batched else 2) + ("model", None)
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def arena_sharding_tree(
    mesh: Mesh, kv_heads: int, arena: Any, *, batched: bool = False
) -> Any:
    """arena_sharding generalised to either arena representation: a plain
    [(B,) L, C, Hkv, hd] array, or the int8 {"q": [(B,) L, C, Hkv, hd],
    "s": [(B,) L, C, Hkv]} pytree (StreamConfig.kv_quant) — the scales
    shard over the same KV-head axis so dequantization stays device-local."""
    sh = arena_sharding(mesh, kv_heads, batched=batched)
    if not isinstance(arena, dict):
        return sh
    s_spec = P(*tuple(sh.spec)[:-1]) if tuple(sh.spec) else P()
    return {"q": sh, "s": NamedSharding(mesh, s_spec)}


def arena_shard_factor(mesh, kv_heads: int) -> int:
    """How many ways the arena's bytes split across devices (1 = replicated).
    Used by the HBM budget guards to reason per-chip."""
    if mesh is None:
        return 1
    m = int(mesh.shape.get("model", 1))
    return m if (m > 1 and kv_heads % m == 0) else 1
