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


def shard_opt_state(optimizer, params: Any, param_shardings: Any, mesh: Mesh):
    """Initialise optimizer state DIRECTLY onto the params' shards.

    The TPU equivalent of the reference's ZeRO-3 optimizer partitioning
    (scripts/zero3.json:16-27): AdamW's mu/nu moments are param-shaped, so
    they inherit the exact FSDP/TP sharding of their parameter — no device
    ever holds a replicated copy (AdamW state for 3B alone exceeds a 16 GB
    chip, BENCH_TRAIN_r04.json). Works for any optax state built from
    NamedTuples/tuples/dicts: every sub-pytree structurally identical to
    `params` gets `param_shardings`; every other leaf (step counts, schedule
    scalars) is replicated. The init runs under jit with out_shardings, so
    the moments are CREATED sharded rather than materialised then moved."""
    ptree = jax.tree_util.tree_structure(params)
    repl = NamedSharding(mesh, P())

    def build(node):
        try:
            if jax.tree_util.tree_structure(node) == ptree:
                return param_shardings
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(build(x) for x in node))
        if isinstance(node, tuple):
            return tuple(build(x) for x in node)
        if isinstance(node, list):
            return [build(x) for x in node]
        if isinstance(node, dict):
            return {k: build(v) for k, v in node.items()}
        return repl

    shapes = jax.eval_shape(optimizer.init, params)
    shardings = build(shapes)
    return jax.jit(optimizer.init, out_shardings=shardings)(params)


def serving_rules(rules: Sequence[Tuple[str, P]]) -> Tuple[Tuple[str, P], ...]:
    """TP-only variants of the sharding rules for the SERVING mesh: the
    'data' axis is reserved for lanes (DP over concurrent streams), so
    weights replicate over it. An FSDP-('data')-sharded weight would
    all-gather on every layer of every decode step — re-paying exactly the
    per-layer weight reads that batching lanes exists to amortise
    (docs/MULTISTREAM.md); for training the FSDP rules stay the default."""
    out = []
    for pat, spec in rules:
        out.append(
            (pat, P(*[None if a == "data" else a for a in tuple(spec)]))
        )
    return tuple(out)


def shard_params_serving(params: Any, mesh: Mesh) -> Any:
    """Place params for a DP(lanes)×TP serving mesh: sharded over 'model'
    (tensor parallel), replicated over 'data' (each lane group holds full
    weights — decode is weight-bandwidth-bound, so weights must be local)."""
    shardings = {
        "vision": sharding_for_tree(
            params["vision"], mesh, serving_rules(VISION_TP_RULES)
        ),
        "text": sharding_for_tree(
            params["text"], mesh, serving_rules(TEXT_TP_RULES)
        ),
    }
    return jax.device_put(params, shardings), shardings


def _lane_axis(mesh: Mesh, lanes: Optional[int]) -> Optional[str]:
    d = int(mesh.shape.get("data", 1))
    if lanes is not None and d > 1 and lanes % d == 0:
        return "data"
    return None


def arena_sharding(
    mesh: Mesh, kv_heads: int, *, batched: bool = False,
    lanes: Optional[int] = None,
) -> NamedSharding:
    """Sharding for the streaming KV arena [L, C, Hkv, hd] (or the
    multi-stream stacked [B, L, C, Hkv, hd] with batched=True): split KV
    heads over the 'model' axis (each device holds its attention heads'
    cache — the multi-chip streaming-cache layout; 7B: 4 kv heads on a
    model=4 mesh axis), falling back to replication when Hkv doesn't
    divide. With `lanes=B` the stacked arena's LANE dim additionally splits
    over the 'data' axis (DP over concurrent streams — the full v5e-8
    serving shape: data×model = lane-groups × TP; requires B % data == 0,
    else lanes replicate)."""
    m = int(mesh.shape.get("model", 1))
    kv_ax = "model" if (m > 1 and kv_heads % m == 0) else None
    lane_ax = _lane_axis(mesh, lanes) if batched else None
    if batched:
        spec = (lane_ax, None, None, kv_ax, None)
    else:
        spec = (None, None, kv_ax, None)
    if all(a is None for a in spec):
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(*spec))


def arena_sharding_tree(
    mesh: Mesh, kv_heads: int, arena: Any, *, batched: bool = False,
    lanes: Optional[int] = None,
) -> Any:
    """arena_sharding generalised to either arena representation: a plain
    [(B,) L, C, Hkv, hd] array, or the int8 {"q": [(B,) L, C, Hkv, hd],
    "s": [(B,) L, C, Hkv]} pytree (StreamConfig.kv_quant) — the scales
    shard over the same KV-head (and lane) axes so dequantization stays
    device-local."""
    sh = arena_sharding(mesh, kv_heads, batched=batched, lanes=lanes)
    if not isinstance(arena, dict):
        return sh
    spec = tuple(sh.spec)
    # "s" drops the trailing head_dim axis; pad the spec first so a
    # short (all-None-suffix-trimmed) spec still lines up
    nd_q = 5 if batched else 4
    spec = spec + (None,) * (nd_q - len(spec))
    s_spec = P(*spec[:-1]) if any(a is not None for a in spec[:-1]) else P()
    return {"q": sh, "s": NamedSharding(mesh, s_spec)}


def arena_shard_factor(
    mesh, kv_heads: int, *, lanes: Optional[int] = None
) -> int:
    """How many ways the arena's bytes split across devices (1 = replicated).
    Used by the HBM budget guards to reason per-chip. With `lanes` the
    stacked multi-stream arena additionally splits over 'data'."""
    if mesh is None:
        return 1
    m = int(mesh.shape.get("model", 1))
    f = m if (m > 1 and kv_heads % m == 0) else 1
    lane_ax = _lane_axis(mesh, lanes)
    if lane_ax is not None:
        f *= int(mesh.shape[lane_ax])
    return f
