"""Generic MCQ predictor: single forward, option chosen by argmax over
option-token logits at the last position.

Parity target: /root/reference/eval/distributed_mcq_predictor.py and
eval/ovobench/distributed_evaluate_ovobench.py:150-199 — prompts are
chat-templated with a trailing answer prefix ('Answer:'), options scored by
the logit of their single token (tokenised as ': X' -> last id), no
generation. Data-parallel fan-out is index round-robin over workers (the
reference's torchrun gather becomes shard-and-merge files)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import ModelConfig

QUESTION_POSTFIX = "\nPlease select the correct answer."
ANSWER_PREFIX = "Answer:"


def build_mcq_prompt_ids(
    cfg: ModelConfig,
    encode: Callable[[str], List[int]],
    question: str,
    n_video_tokens: int,
    *,
    question_prefix: str = "",
    question_postfix: str = QUESTION_POSTFIX,
    answer_prefix: str = ANSWER_PREFIX,
) -> np.ndarray:
    """system + user(video + question) + assistant header + answer prefix."""
    text = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n"
        f"<|vision_start|>{'<|video_pad|>' * n_video_tokens}<|vision_end|>"
        f"{question_prefix}{question}{question_postfix}<|im_end|>\n"
        f"<|im_start|>assistant\n{answer_prefix}"
    )
    return np.asarray(encode(text), np.int32)


def option_token_ids(
    encode: Callable[[str], List[int]], options: Sequence[str], previous_str: str = ": "
) -> List[int]:
    return [encode(f"{previous_str}{o}")[-1] for o in options]


def mcq_predict_one(
    cfg: ModelConfig,
    params,
    ids: np.ndarray,
    option_ids: Sequence[int],
    *,
    pixel_patches=None,
    video_grid_thw=None,
    second_per_grid_ts=None,
) -> int:
    """Returns the index of the argmax option."""
    import jax.numpy as jnp

    from ..models.qwen25_vl import model

    logits = model.forward_full(
        cfg,
        params,
        ids,
        pixel_patches=None if pixel_patches is None else jnp.asarray(pixel_patches),
        video_grid_thw=video_grid_thw,
        second_per_grid_ts=second_per_grid_ts,
    )
    last = np.asarray(logits[-1])
    return int(np.argmax(last[list(option_ids)]))


_MCQ_BATCH_CACHE: Dict = {}


def mcq_predict_batch(
    cfg: ModelConfig,
    params,
    ids_list: Sequence[np.ndarray],
    option_ids_list: Sequence[Sequence[int]],
    *,
    pixel_patches=None,  # [B, S, patch_dim]: one single-grid video per question
    video_grid_thw: Optional[Tuple[int, int, int]] = None,  # shared by the batch
    second_per_grid_ts: Optional[Sequence[float]] = None,
    bucket: int = 128,
) -> List[int]:
    """Batched MCQ scoring: B questions in ONE device dispatch.

    The TPU-idiomatic replacement for the reference's eval fan-out (8 GPUs x
    1 question each, distributed_evaluate_ovobench.py:186-199): right-pad
    prompts to a shared bucket (causal attention makes trailing pads
    invisible to real positions), vmap the embed/merge/decoder stack with one
    weight read for the whole batch, read each question's logits at its own
    last real position. Per-question single-grid vision towers run vmapped
    (same executable-shape lesson as multi-stream serving). Matches
    mcq_predict_one per element exactly (tests/test_eval_harnesses.py)."""
    import jax
    import jax.numpy as jnp

    from ..models.qwen25_vl import language as _lang
    from ..models.qwen25_vl import model
    from ..models.qwen25_vl.model import mrope_positions_from_ids

    B = len(ids_list)
    assert B == len(option_ids_list) and B > 0
    if video_grid_thw is not None:
        video_grid_thw = tuple(int(x) for x in video_grid_thw)
    n_opt = len(option_ids_list[0])
    assert all(len(o) == n_opt for o in option_ids_list)
    lens = np.asarray([len(i) for i in ids_list], np.int32)
    T = int(-(-int(lens.max()) // bucket) * bucket)
    pad_id = cfg.tokens.pad
    ids = np.full((B, T), pad_id, np.int32)
    positions = np.zeros((B, 3, T), np.float32)
    slots = None
    grids = None if video_grid_thw is None else np.asarray([video_grid_thw])
    for b, row in enumerate(ids_list):
        L = len(row)
        ids[b, :L] = row
        spg = None
        if second_per_grid_ts is not None:
            spg = np.asarray([second_per_grid_ts[b]], np.float32)
        pos, _ = mrope_positions_from_ids(
            ids[b],
            grids,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            tokens_per_second=cfg.vision.tokens_per_second,
            second_per_grid_ts=spg,
            video_token_id=cfg.tokens.video_pad,
            image_token_id=cfg.tokens.image_pad,
        )
        positions[b] = pos
        if video_grid_thw is not None:
            (s,) = np.nonzero(ids[b] == cfg.tokens.video_pad)
            if slots is None:
                slots = np.zeros((B, len(s)), np.int32)
            assert len(s) == slots.shape[1], "one shared grid per batch"
            slots[b] = s

    key = (cfg, T, n_opt, video_grid_thw, pixel_patches is not None)
    fn = _MCQ_BATCH_CACHE.get(key)
    if fn is None:
        tcfg = cfg.text

        @jax.jit
        def fn(params, ids, positions, patches, slots, last_idx, opt_ids):
            def one(ids1, pos1, patch1, slots1):
                emb = _lang.embed_tokens(tcfg, params["text"], ids1)
                if patch1 is not None:
                    tower = model._encode_video_jit(cfg, (video_grid_thw,))
                    vis = tower(params["vision"], patch1)
                    emb = emb.at[slots1].set(vis.astype(emb.dtype))
                return _lang.language_forward(tcfg, params["text"], emb, pos1)

            if patches is None:
                hidden = jax.vmap(lambda i, p: one(i, p, None, None))(ids, positions)
            else:
                hidden = jax.vmap(one)(ids, positions, patches, slots)
            last = jnp.take_along_axis(
                hidden, last_idx[:, None, None], axis=1
            )[:, 0]
            logits = _lang.lm_logits(tcfg, params["text"], last)  # [B, V]
            scores = jnp.take_along_axis(logits, opt_ids, axis=1)
            return jnp.argmax(scores, axis=1)

        _MCQ_BATCH_CACHE[key] = fn

    out = fn(
        params,
        jnp.asarray(ids),
        jnp.asarray(positions),
        None if pixel_patches is None else jnp.asarray(pixel_patches),
        None if slots is None else jnp.asarray(slots),
        jnp.asarray(lens - 1),
        jnp.asarray(np.asarray(option_ids_list, np.int32)),
    )
    return [int(x) for x in np.asarray(out)]


def shard_indices(n: int, worker: int, num_workers: int) -> List[int]:
    """Round-robin sharding (reference distributed_generate_streaming.py:62)."""
    return list(range(n))[worker::num_workers]
