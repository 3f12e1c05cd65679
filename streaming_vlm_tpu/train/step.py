"""SFT training step (streaming-aligned next-token objective).

Mirrors the reference recipe (train.py:65-111, scripts/sft_stage_1.sh):
frozen vision tower, bf16 forward, label mask = assistant spans only (-100
elsewhere), cross-entropy without materialising [L, vocab] f32 logits more
than once (a fused chunked linear-CE Pallas kernel replaces this later —
liger-kernel equivalent, SURVEY.md §2b).
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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """batch: input_ids [B, T], labels [B, T] (-100 masked), positions [B, 3, T],
    optional inputs_embeds [B, T, D] (vision already merged).
    Returns (mean loss over labeled tokens, labeled-token count)."""
    tcfg = cfg.text

    def per_example(ids, labels, positions, vis_embeds, vis_slots):
        x = language.embed_tokens(tcfg, params["text"], ids)
        if vis_embeds is not None:
            # frozen-ViT embeddings scattered into video-token slots; padded
            # slots point out of range and are dropped
            x = x.at[vis_slots].set(vis_embeds.astype(x.dtype), mode="drop")
        hidden = language.language_forward(tcfg, params["text"], x, positions)
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
        nll = chunked_cross_entropy(hidden, w, safe_t)
        nll = jnp.where(mask, nll, 0.0)
        return nll.sum(), mask.sum()

    ve = batch.get("vis_embeds")
    vs = batch.get("vis_slots")
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
    sched = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, max(warmup_steps, 1), max(total_steps, 2)
    )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )


def make_train_step(cfg: ModelConfig, optimizer, freeze_vision: bool = True):
    """Build a jittable train step over text params (vision frozen like the
    reference, train.py:77-82)."""

    def step(params: Params, opt_state, batch):
        def loss_fn(text_params):
            p = {**params, "text": text_params}
            loss, count = sft_loss(cfg, p, batch)
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
