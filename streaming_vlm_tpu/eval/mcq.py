"""Generic MCQ predictor: single forward, option chosen by argmax over
option-token logits at the last position.

Parity target: /root/reference/eval/distributed_mcq_predictor.py and
eval/ovobench/distributed_evaluate_ovobench.py:150-199 — prompts are
chat-templated with a trailing answer prefix ('Answer:'), options scored by
the logit of their single token (tokenised as ': X' -> last id), no
generation. Data-parallel fan-out is index round-robin over workers (the
reference's torchrun gather becomes shard-and-merge files)."""

from __future__ import annotations

import json
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


def shard_indices(n: int, worker: int, num_workers: int) -> List[int]:
    """Round-robin sharding (reference distributed_generate_streaming.py:62)."""
    return list(range(n))[worker::num_workers]
