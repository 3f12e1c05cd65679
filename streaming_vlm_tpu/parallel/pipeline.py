"""Pipeline parallelism (GPipe-style) over the scan-stacked decoder layers.

The reference has NO pipeline parallelism (SURVEY.md §2c: ZeRO-3 data
parallelism only); this is a beyond-reference scaling mode for models whose
layer stack does not fit one chip's HBM even TP-sharded (e.g. 72B-class on
a v5e pod slice), and the TPU-idiomatic expression of it: the layer axis of
the stacked parameter tree shards over a 'stage' mesh axis via `shard_map`,
and microbatch activations rotate stage→stage+1 with `lax.ppermute` (one
ICI hop per microbatch per step — a [T, D] carry, tiny next to the weight
traffic PP exists to split).

Schedule: plain GPipe fill/drain over `M` microbatches and `S` stages —
M + S - 1 pipeline steps, bubble fraction (S-1)/(M+S-1). Each microbatch is
one batch example (the reference trains per-device batch 1 with grad-accum
64 — sft_stage_1.sh:45 — so examples are the natural microbatch unit here
too). Gradients flow through the `ppermute` rotations (its transpose is the
reverse rotation), so `jax.grad` of the pipelined loss equals the vmapped
single-device loss exactly — tested in tests/test_pipeline.py.

Composition: the 'stage' axis is orthogonal to 'data' (DP/FSDP) and
'model' (TP) — a ('data', 'stage') mesh runs grad-accumulated DP groups of
pipelines. In-stage remat composes too (`remat=` threads through to the
same jax.checkpoint policies language_forward uses).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig
from ..models.qwen25_vl import language
from ..models.qwen25_vl.language import _layer_body
from ..models.qwen25_vl.rope import make_inv_freq, mrope_cos_sin

Params = Dict[str, Any]


def _stage_scan(cfg, layers_blk, hidden, cos, sin, mask, remat: str):
    """Run one stage's contiguous layer block (a [L/S, ...] slice of the
    stacked layer tree) over one microbatch's carry."""

    def body(h, lp):
        h, _, _, _ = _layer_body(
            cfg, h, lp, q_cos=cos, q_sin=sin, self_mask=mask, context=[]
        )
        return h, None

    if remat != "none":
        policy = (
            None
            if remat == "full"
            else jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
        body = jax.checkpoint(body, policy=policy, prevent_cse=False)
    hidden, _ = jax.lax.scan(body, hidden, layers_blk)
    return hidden


def pipeline_language_forward(
    cfg,  # TextConfig
    layers: Params,  # stacked layer tree, leaves [L, ...]
    x_mb: jnp.ndarray,  # [M, T, D] microbatch embeddings
    positions_mb: jnp.ndarray,  # [M, 3, T] float32
    mesh: Mesh,
    *,
    stage_axis: str = "stage",
    remat: str = "none",
    attn_mask: Optional[jnp.ndarray] = None,  # [T, T]; default causal
) -> jnp.ndarray:
    """GPipe forward over the decoder stack: microbatch m's carry visits
    stage s (layers [s*L/S, (s+1)*L/S)) at pipeline step m + s. Returns
    [M, T, D] pre-final-norm hidden states, replicated over the mesh.

    Numerics are EXACTLY language_forward's: the same `_layer_body` runs on
    the same [T, D] carry in the same order — the pipeline only changes
    which device holds which layers.
    """
    M, T, D = x_mb.shape
    S = int(mesh.shape[stage_axis])
    L = jax.tree_util.tree_leaves(layers)[0].shape[0]
    assert L % S == 0, f"layers {L} must divide stages {S}"
    # DP composition: a 'data' axis on the mesh splits the microbatch set
    # into independent pipeline groups (each group's stages span the 'stage'
    # axis; layer weights replicate over 'data', so their grad transpose
    # psums over 'data' — exactly grad accumulation across groups)
    dp_axis = "data" if "data" in mesh.axis_names else None
    dp = int(mesh.shape[dp_axis]) if dp_axis else 1
    assert M % dp == 0, f"microbatches {M} must divide the data axis {dp}"

    inv_freq = jnp.asarray(make_inv_freq(cfg.head_dim, cfg.rope_theta))
    cos_mb, sin_mb = jax.vmap(
        lambda p: mrope_cos_sin(p, inv_freq, cfg.mrope_section)
    )(positions_mb)  # [M, T, f] each
    if attn_mask is None:
        attn_mask = jnp.tril(jnp.ones((T, T), bool))

    # leading layer axis -> [S, L/S, ...]: the 'stage' dim shard_map splits
    layers_st = jax.tree_util.tree_map(
        lambda a: a.reshape((S, L // S) + a.shape[1:]), layers
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(stage_axis), P(dp_axis), P(dp_axis), P(dp_axis), P()),
        out_specs=P(dp_axis),
    )
    def run(layers_blk, x_mb, cos_mb, sin_mb, mask):
        # shard_map hands each stage a [1, L/S, ...] slice; drop the lead
        layers_blk = jax.tree_util.tree_map(lambda a: a[0], layers_blk)
        stage = jax.lax.axis_index(stage_axis)
        m = x_mb.shape[0]  # this data group's microbatch count
        out = jnp.zeros_like(x_mb)
        state = jnp.zeros((T, D), x_mb.dtype)
        for t in range(m + S - 1):
            if t < m:
                state = jnp.where(stage == 0, x_mb[t], state)
            # the microbatch THIS stage holds at step t entered at t-stage
            mb_i = jnp.clip(t - stage, 0, m - 1)
            cos = jnp.take(cos_mb, mb_i, axis=0)
            sin = jnp.take(sin_mb, mb_i, axis=0)
            state = _stage_scan(cfg, layers_blk, state, cos, sin, mask, remat)
            if t >= S - 1:
                done = jnp.where(stage == S - 1, state, out[t - (S - 1)])
                out = out.at[t - (S - 1)].set(done)
            if S > 1:
                state = jax.lax.ppermute(
                    state, stage_axis, [(i, (i + 1) % S) for i in range(S)]
                )
        # collected outputs live on the last stage; replicate over 'stage'
        out = jnp.where(stage == S - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, stage_axis)

    return run(layers_st, x_mb, cos_mb, sin_mb, attn_mask)


def sft_loss_pp(
    cfg: ModelConfig,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    mesh: Mesh,
    *,
    stage_axis: str = "stage",
    remat: str = "none",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pipeline-parallel twin of train.step.sft_loss: same batch schema
    ([B, T] ids/labels, [B, 3, T] positions, optional vis_embeds/vis_slots),
    same loss definition (fused linear-CE over assistant-labeled tokens) —
    each batch example is one pipeline microbatch. Embedding, vision
    scatter, final norm and the CE head run replicated outside the pipeline
    (they are a few percent of the FLOPs; the layer stack is what PP
    splits)."""
    from ..train.step import IGNORE_INDEX, fused_linear_ce

    tcfg = cfg.text
    ids, labels, positions = (
        batch["input_ids"], batch["labels"], batch["positions"],
    )
    x = jax.vmap(lambda i: language.embed_tokens(tcfg, params["text"], i))(ids)
    ve, vs = batch.get("vis_embeds"), batch.get("vis_slots")
    if ve is not None:
        x = jax.vmap(
            lambda xe, e, s: xe.at[s].set(e.astype(xe.dtype), mode="drop")
        )(x, ve, vs)

    hidden = pipeline_language_forward(
        tcfg, params["text"]["layers"], x, positions, mesh,
        stage_axis=stage_axis, remat=remat,
    )
    hidden = jax.vmap(
        lambda h: language.rms_norm(h, params["text"]["final_ln"], tcfg.rms_norm_eps)
    )(hidden)

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


def make_train_step_pp(
    cfg: ModelConfig,
    optimizer,
    mesh: Mesh,
    *,
    stage_axis: str = "stage",
    remat: str = "none",
):
    """Pipeline-parallel twin of train.step.make_train_step (vision frozen,
    text params trained). Gradients are mathematically the vmapped step's
    (tests/test_pipeline.py asserts it); the optimizer update is the same
    optax chain, so PP is a drop-in scaling mode for the trainer."""
    import optax

    def step(params: Params, opt_state, batch):
        def loss_fn(text_params):
            p = {**params, "text": text_params}
            return sft_loss_pp(
                cfg, p, batch, mesh, stage_axis=stage_axis, remat=remat
            )

        (loss, count), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["text"]
        )
        updates, opt_state = optimizer.update(grads, opt_state, params["text"])
        new_text = optax.apply_updates(params["text"], updates)
        metrics = {
            "loss": loss,
            "labeled_tokens": count,
            "grad_norm": optax.global_norm(grads),
        }
        return {**params, "text": new_text}, opt_state, metrics

    return step
