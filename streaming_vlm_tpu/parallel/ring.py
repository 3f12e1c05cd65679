"""Sequence (context) parallelism: ring attention over a 'seq' mesh axis.

The reference has NO sequence parallelism (SURVEY.md §2c — infinite streams
are handled algorithmically by the bounded streaming KV cache, and training
sequences are capped to what one GPU fits). This is a beyond-reference
scaling mode for TRAINING at sequence lengths past one chip's HBM: the
sequence dim of every activation shards over a 'seq' mesh axis; the only
op that needs cross-shard communication is attention, computed as RING
ATTENTION (Liu et al., arXiv:2310.01889 — see PAPERS.md) — each device
holds one K/V block and the blocks rotate around the ring with
`lax.ppermute` while a running online-softmax (max / denominator /
accumulator triple, same algebra as ops/attention.py's flash kernel and
language._gqa_attention_multi's shared-row-max merge) folds in one block
per step. S-1 ICI hops per layer, each a [B, T/S, Hkv, hd] block — overlap
with the einsums is XLA's job; memory per device is O(T/S).

Exactness: online softmax is the same math as a joint softmax, so the
sequence-parallel loss and grads equal the single-device `sft_loss` up to
fp32 roundoff (tested in tests/test_ring.py). Gradients flow through
`ppermute` (its transpose is the reverse rotation).

Composition: batch dim may shard over 'data' at the same time (a
('data','seq') mesh = FSDP-style DP groups × sequence shards).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig
from ..models.qwen25_vl import language
from ..models.qwen25_vl.language import NEG_INF, rms_norm, swiglu
from ..models.qwen25_vl.rope import apply_rope, make_inv_freq, mrope_cos_sin
from ..ops.quant import mm

Params = Dict[str, Any]


def _ring_gqa_attention(
    q: jnp.ndarray,  # [B, Tl, H, hd] rotated (local query block)
    k: jnp.ndarray,  # [B, Tl, Hkv, hd] rotated (this device's key block)
    v: jnp.ndarray,  # [B, Tl, Hkv, hd]
    axis: str,
) -> jnp.ndarray:
    """Causal GQA ring attention inside shard_map: device s owns query/key
    block s of S; K/V blocks rotate s -> s+1 each step while an online
    softmax accumulates. Step 0 processes the device's OWN block (the
    causal diagonal), so the running max is finite from the start and
    fully-masked later blocks contribute exp(NEG_INF - m) = 0."""
    B, Tl, H, hd = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    S = jax.lax.axis_size(axis)
    s = jax.lax.axis_index(axis)
    scale = 1.0 / np.sqrt(hd)

    qg = q.reshape(B, Tl, Hkv, G, hd).astype(jnp.float32)
    qpos = s * Tl + jnp.arange(Tl)  # global query positions

    m = jnp.full((B, Hkv, G, Tl), NEG_INF, jnp.float32)
    l = jnp.zeros((B, Hkv, G, Tl), jnp.float32)
    acc = jnp.zeros((B, Hkv, G, Tl, hd), jnp.float32)
    kb, vb = k.astype(jnp.float32), v.astype(jnp.float32)
    perm = [(i, (i + 1) % S) for i in range(S)]

    for step in range(S):
        blk = (s - step) % S  # which block's keys this device holds now
        lg = jnp.einsum(
            "btkgd,bukd->bkgtu", qg, kb, preferred_element_type=jnp.float32
        )
        kpos = blk * Tl + jnp.arange(Tl)
        mask = kpos[None, :] <= qpos[:, None]  # [Tl(q), Tl(k)] causal
        lg = jnp.where(mask[None, None, None], lg * scale, NEG_INF)
        m_new = jnp.maximum(m, lg.max(axis=-1))
        w_old = jnp.exp(m - m_new)
        p = jnp.exp(lg - m_new[..., None])
        l = l * w_old + p.sum(axis=-1)
        acc = acc * w_old[..., None] + jnp.einsum(
            "bkgtu,bukd->bkgtd", p, vb, preferred_element_type=jnp.float32
        )
        m = m_new
        if S > 1 and step < S - 1:
            kb = jax.lax.ppermute(kb, axis, perm)
            vb = jax.lax.ppermute(vb, axis, perm)

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tl, H * hd)


def _layer_body_sp(cfg, hidden, lp, cos, sin, axis):
    """language._layer_body (context=[] training form) on a [B, Tl, D]
    sequence shard with ring attention as the mixing op. Same projections,
    norms and residual order — only the attention communicates."""
    B, Tl, _ = hidden.shape
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    x = rms_norm(hidden, lp["input_ln"], cfg.rms_norm_eps)
    q = (mm(x, lp["q_w"]) + lp["q_b"]).reshape(B, Tl, H, hd)
    k = (mm(x, lp["k_w"]) + lp["k_b"]).reshape(B, Tl, Hkv, hd)
    v = (mm(x, lp["v_w"]) + lp["v_b"]).reshape(B, Tl, Hkv, hd)
    q = apply_rope(q, cos[:, :, None, :], sin[:, :, None, :])
    k = apply_rope(k, cos[:, :, None, :], sin[:, :, None, :])
    attn = _ring_gqa_attention(q, k, v, axis).astype(hidden.dtype)
    hidden = hidden + mm(attn, lp["o_w"])
    x = rms_norm(hidden, lp["post_ln"], cfg.rms_norm_eps)
    return hidden + swiglu(x, lp["gate_w"], lp["up_w"], lp["down_w"])


def sp_language_forward(
    cfg,  # TextConfig
    params_text: Params,
    x: jnp.ndarray,  # [B, T, D] embeddings
    positions: jnp.ndarray,  # [B, 3, T]
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    remat: str = "none",
) -> jnp.ndarray:
    """Sequence-parallel decoder stack: T shards over the 'seq' axis (and B
    over 'data' if the mesh has one); per-layer ring attention; returns
    post-final-norm hidden [B, T, D]. Numerics match language_forward up to
    online-softmax fp roundoff."""
    B, T, D = x.shape
    S = int(mesh.shape[seq_axis])
    assert T % S == 0, f"seq len {T} must divide the seq axis {S}"
    dp_axis = "data" if "data" in mesh.axis_names else None
    if dp_axis:
        assert B % int(mesh.shape[dp_axis]) == 0

    inv_freq = jnp.asarray(make_inv_freq(cfg.head_dim, cfg.rope_theta))
    cos, sin = jax.vmap(
        lambda p: mrope_cos_sin(p, inv_freq, cfg.mrope_section)
    )(positions)  # [B, T, hd/2]

    layers = params_text["layers"]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # layer stack replicated (grad transpose psums over axes)
            P(dp_axis, seq_axis),
            P(dp_axis, seq_axis),
            P(dp_axis, seq_axis),
        ),
        out_specs=P(dp_axis, seq_axis),
    )
    def run(layers, x_loc, cos_loc, sin_loc):
        def body(h, lp):
            return (
                _layer_body_sp(cfg, h, lp, cos_loc, sin_loc, seq_axis),
                None,
            )

        if remat != "none":
            policy = (
                None
                if remat == "full"
                else jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            )
            body = jax.checkpoint(body, policy=policy, prevent_cse=False)
        h, _ = jax.lax.scan(body, x_loc, layers)
        return rms_norm(h, params_text["final_ln"], cfg.rms_norm_eps)

    return run(layers, x, cos, sin)


def sft_loss_sp(
    cfg: ModelConfig,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    remat: str = "none",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence-parallel twin of train.step.sft_loss (same batch schema and
    loss definition). Embedding/vision-scatter run per example before the
    shard; the CE head runs on the re-assembled (GSPMD-sharded) hidden."""
    from ..train.step import IGNORE_INDEX, fused_linear_ce

    tcfg = cfg.text
    ids, labels = batch["input_ids"], batch["labels"]
    x = jax.vmap(lambda i: language.embed_tokens(tcfg, params["text"], i))(ids)
    ve, vs = batch.get("vis_embeds"), batch.get("vis_slots")
    if ve is not None:
        x = jax.vmap(
            lambda xe, e, s: xe.at[s].set(e.astype(xe.dtype), mode="drop")
        )(x, ve, vs)

    hidden = sp_language_forward(
        tcfg, params["text"], x, batch["positions"], mesh,
        seq_axis=seq_axis, remat=remat,
    )
    w = (
        params["text"]["embed"].T
        if tcfg.tie_word_embeddings
        else params["text"]["lm_head"]
    )

    def per_example(h, lab):
        h = h[:-1]
        targets = lab[1:]
        mask = targets != IGNORE_INDEX
        safe_t = jnp.where(mask, targets, 0)
        return fused_linear_ce(h, w, safe_t, mask), mask.sum()

    total, count = jax.vmap(per_example)(hidden, labels)
    count = jnp.maximum(count.sum(), 1)
    return total.sum() / count, count
