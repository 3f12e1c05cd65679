"""SFT training step (streaming-aligned next-token objective).

Mirrors the reference recipe (train.py:65-111, scripts/sft_stage_1.sh):
frozen vision tower, bf16 forward, label mask = assistant spans only (-100
elsewhere), and a bounded-memory linear-CE loss. Two forms, both never
materialising [T, vocab] logits (liger-kernel equivalent, SURVEY.md §2b):
`fused_linear_ce` (default; liger's one-pass loss+grads fusion via
custom_vjp) and `chunked_cross_entropy` (checkpoint/remat form kept for
per-token NLLs). Measured numbers in the docstrings below.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models.qwen25_vl import language

Params = Dict[str, Any]

IGNORE_INDEX = -100

CE_CHUNK = 256  # rows per logits chunk: peak logits memory = CE_CHUNK * vocab
# the fused loss+grads pass wants LARGER chunks: its f32 [D, V] dW accumulator
# is re-read/written once per chunk, so small chunks drown in accumulator
# traffic (measured at T=8192/3B vocab on v5e: 237 ms @256, 153 ms @2048 vs
# 158 ms for the checkpoint/remat form and 104 ms for naive-with-[T,V]-logits)
FUSED_CE_CHUNK = 2048


def _fused_ce_pass(hidden, lm_head, targets, mask, *, with_grads: bool):
    """One chunked sweep computing the masked NLL sum and (optionally) BOTH
    gradients in the same pass — liger-kernel's actual fusion
    (patch_liger_kernel.py:209-226): because the loss is terminal, the
    upstream cotangent is a SCALAR, so dlogits = (softmax - onehot) * mask can
    be consumed for dh and dW chunk-by-chunk without ever materialising
    [T, V] or recomputing logits in the backward. 3 matmul passes total
    (logits, dh, dW) vs 4 for the checkpoint/remat form — measured 153 vs
    158 ms fwd+grad at T=8192 on v5e (naive with full [T, V] logits: 104) —
    at [FUSED_CE_CHUNK, V] logits memory plus an f32 [D, V] dW
    accumulator."""
    T, D = hidden.shape
    V = lm_head.shape[1]
    cc = FUSED_CE_CHUNK
    pad = (-T) % cc
    h = jnp.pad(hidden, ((0, pad), (0, 0)))
    t = jnp.pad(targets, (0, pad))
    m = jnp.pad(mask, (0, pad)).astype(jnp.float32)
    hc = h.reshape(-1, cc, D)
    tc = t.reshape(-1, cc)
    mc = m.reshape(-1, cc)

    def body(carry, args):
        nll_acc, dw_acc = carry
        hh, tt, mm = args
        logits = jnp.dot(hh, lm_head, preferred_element_type=jnp.float32)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        tgt = jnp.take_along_axis(logits, tt[:, None], axis=-1)
        nll = (jnp.log(l[:, 0]) + mx[:, 0] - tgt[:, 0]) * mm
        if not with_grads:
            return (nll_acc + nll.sum(), dw_acc), None
        dlog = (p / l).at[jnp.arange(cc), tt].add(-1.0) * mm[:, None]
        dh = jnp.dot(
            dlog.astype(lm_head.dtype), lm_head.T,
            preferred_element_type=jnp.float32,
        )
        dw_acc = dw_acc + jnp.dot(
            hh.T.astype(jnp.float32), dlog, preferred_element_type=jnp.float32
        )
        return (nll_acc + nll.sum(), dw_acc), dh

    dw0 = (
        jnp.zeros((D, V), jnp.float32)
        if with_grads
        else jnp.zeros((1, 1), jnp.float32)
    )
    (nll_sum, dw), dh = jax.lax.scan(body, (jnp.float32(0.0), dw0), (hc, tc, mc))
    if not with_grads:
        return nll_sum, None, None
    dh = dh.reshape(-1, D)[:T]
    return nll_sum, dh, dw


@jax.custom_vjp
def fused_linear_ce(hidden, lm_head, targets, mask):
    """Masked next-token NLL SUM with a fused one-pass backward (see
    _fused_ce_pass). targets must be in-range (mask the ignore rows)."""
    nll, _, _ = _fused_ce_pass(hidden, lm_head, targets, mask, with_grads=False)
    return nll


def _fused_ce_fwd(hidden, lm_head, targets, mask):
    nll, dh, dw = _fused_ce_pass(hidden, lm_head, targets, mask, with_grads=True)
    # store cotangent-dtyped residuals (must match the primals' dtypes)
    return nll, (dh.astype(hidden.dtype), dw.astype(lm_head.dtype))


def _fused_ce_bwd(res, g):
    dh, dw = res
    return (
        (g * dh.astype(jnp.float32)).astype(dh.dtype),
        (g * dw.astype(jnp.float32)).astype(dw.dtype),
        None,
        None,
    )


fused_linear_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def chunked_cross_entropy(
    hidden: jnp.ndarray,  # [T, D]
    lm_head: jnp.ndarray,  # [D, V]
    targets: jnp.ndarray,  # [T] int32 (already made safe; mask applied outside)
) -> jnp.ndarray:
    """Per-token NLL without materialising the full [T, V] logits.

    The [T, V] f32 logits of a 150k-vocab model at T=8k are ~5 GB — the
    reference fixes this with liger-kernel's fused linear-CE
    (patch_liger_kernel.py:209-226). Here: lax.map over row chunks with
    rematerialisation, so both forward and backward peak at
    [CE_CHUNK, V]."""
    T, D = hidden.shape
    pad = (-T) % CE_CHUNK
    h = jnp.pad(hidden, ((0, pad), (0, 0)))
    t = jnp.pad(targets, (0, pad))
    hc = h.reshape(-1, CE_CHUNK, D)
    tc = t.reshape(-1, CE_CHUNK)

    @jax.checkpoint
    def one_chunk(args):
        hh, tt = args
        logits = jnp.dot(hh, lm_head, preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, tt[:, None], axis=-1)[:, 0]
        return lse - tgt

    nll = jax.lax.map(one_chunk, (hc, tc))
    return nll.reshape(-1)[:T]


def sft_loss(
    cfg: ModelConfig,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    remat: str = "none",
    grid_thw: Optional[Tuple[int, int, int]] = None,
    attn_q_block: Optional[int] = None,  # block-recomputed attention
    # (language.language_forward): None = auto-on at T >= 2048 — the lever
    # that lifts the reference's long-interleaved-stream training class
    # (lmm_dataset.py:366-391) past the naive [T, T]-scores memory wall
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """batch: input_ids [B, T], labels [B, T] (-100 masked), positions [B, 3, T],
    optional vis_embeds [B, n_vis, D] (vision already merged — the frozen-ViT
    recipe) OR pixel_patches [B, S, patch_dim] + static `grid_thw` to run the
    vision tower INSIDE the loss (differentiable through params['vision'];
    required for freeze_vision=False finetuning).
    Returns (mean loss over labeled tokens, labeled-token count).

    `remat` ("full"/"dots") enables activation checkpointing on the decoder
    layer scan — the reference trains with gradient_checkpointing + ZeRO-3
    (scripts/sft_stage_1.sh:45); without it, per-layer [T, I] activations all
    stay live for backward and 7B at the reference's sequence lengths cannot
    fit a 16 GB chip (see language.language_forward)."""
    tcfg = cfg.text

    def per_example(ids, labels, positions, vis_embeds, vis_slots):
        x = language.embed_tokens(tcfg, params["text"], ids)
        if vis_embeds is not None:
            # frozen-ViT embeddings scattered into video-token slots; padded
            # slots point out of range and are dropped
            x = x.at[vis_slots].set(vis_embeds.astype(x.dtype), mode="drop")
        hidden = language.language_forward(
            tcfg, params["text"], x, positions, remat=remat,
            attn_q_block=attn_q_block,
        )
        # next-token shift
        hidden = hidden[:-1]
        targets = labels[1:]
        mask = targets != IGNORE_INDEX
        safe_t = jnp.where(mask, targets, 0)
        w = (
            params["text"]["embed"].T
            if tcfg.tie_word_embeddings
            else params["text"]["lm_head"]
        )
        return fused_linear_ce(hidden, w, safe_t, mask), mask.sum()

    ve = batch.get("vis_embeds")
    vs = batch.get("vis_slots")
    pp = batch.get("pixel_patches")
    if ve is None and pp is not None:
        # in-graph vision encode: grads flow to params['vision'] when the
        # caller differentiates the full tree (make_train_step
        # freeze_vision=False). One tower per example, vmapped — the same
        # single-grid-executable shape multi-stream serving uses.
        assert grid_thw is not None, "pixel_patches in batch need grid_thw"
        from ..models.qwen25_vl import model as _model

        tower = _model._encode_video_jit(cfg, (tuple(int(x) for x in grid_thw),))
        ve = jax.vmap(lambda p: tower(params["vision"], p))(pp)
    if ve is not None:
        total, count = jax.vmap(per_example)(
            batch["input_ids"], batch["labels"], batch["positions"], ve, vs
        )
    else:
        total, count = jax.vmap(
            lambda i, l, p: per_example(i, l, p, None, None)
        )(batch["input_ids"], batch["labels"], batch["positions"])
    count = jnp.maximum(count.sum(), 1)
    return total.sum() / count, count


def make_optimizer(
    learning_rate: float = 1e-5,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
    warmup_steps: int = 0,
    total_steps: int = 10000,
) -> optax.GradientTransformation:
    # decay_steps must exceed warmup (optax requires positive decay span);
    # clamp so tiny max_steps smoke configs don't trip it
    warmup = max(warmup_steps, 1)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup, max(total_steps, warmup + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )


def make_train_step(
    cfg: ModelConfig, optimizer, freeze_vision: bool = True, remat: str = "none",
    grid_thw: Optional[Tuple[int, int, int]] = None,
):
    """Build a jittable train step. freeze_vision=True (the reference's
    recipe, train.py:77-82) differentiates and updates only params['text'];
    the caller's opt_state must be initialised over params['text'].
    freeze_vision=False finetunes the FULL tree (ViT included) — opt_state
    over the full params, and the batch must carry pixel_patches (+ static
    grid_thw here) instead of precomputed vis_embeds, so the tower runs
    inside the differentiated loss."""

    if not freeze_vision:

        def step(params: Params, opt_state, batch):
            def loss_fn(p):
                return sft_loss(cfg, p, batch, remat=remat, grid_thw=grid_thw)

            (loss, count), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            metrics = {
                "loss": loss,
                "labeled_tokens": count,
                "grad_norm": optax.global_norm(grads),
            }
            return new_params, opt_state, metrics

        return step

    def step(params: Params, opt_state, batch):
        def loss_fn(text_params):
            p = {**params, "text": text_params}
            loss, count = sft_loss(cfg, p, batch, remat=remat, grid_thw=grid_thw)
            return loss, count

        (loss, count), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["text"]
        )
        updates, opt_state = optimizer.update(grads, opt_state, params["text"])
        new_text = optax.apply_updates(params["text"], updates)
        new_params = {**params, "text": new_text}
        metrics = {"loss": loss, "labeled_tokens": count, "grad_norm": optax.global_norm(grads)}
        return new_params, opt_state, metrics

    return step
