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
    pixel_patches=None,  # [B, S, patch_dim] shared grid, or per-question list
    video_grid_thw=None,  # (t,h,w) shared by the batch, or per-question list
    second_per_grid_ts: Optional[Sequence[float]] = None,
    bucket: int = 128,
    vis_bucket: int = 64,
) -> List[int]:
    """Batched MCQ scoring: B questions in ONE device dispatch.

    The TPU-idiomatic replacement for the reference's eval fan-out (8 GPUs x
    1 question each, distributed_evaluate_ovobench.py:186-199): right-pad
    prompts to a shared bucket (causal attention makes trailing pads
    invisible to real positions), vmap the embed/merge/decoder stack with one
    weight read for the whole batch, read each question's logits at its own
    last real position. Per-question single-grid vision towers run vmapped
    (same executable-shape lesson as multi-stream serving). Matches
    mcq_predict_one per element exactly (tests/test_eval_harnesses.py).

    MIXED GRIDS (the OVO-Bench case: every question crops a different video
    span): pass `video_grid_thw` as a per-question list of (t,h,w) and
    `pixel_patches` as a per-question list of [S_b, patch_dim] arrays (None
    entries = text-only questions). Each question's vision encodes through
    its own single-grid tower executable (compiled once per grid, exactly
    the multi-stream mixed-round design); embeds pad to the batch max
    (rounded up to `vis_bucket` to bound executable count) and pad rows
    scatter-drop via out-of-bounds slots. One LM dispatch for the batch
    either way."""
    import jax
    import jax.numpy as jnp

    from ..models.qwen25_vl import language as _lang
    from ..models.qwen25_vl import model
    from ..models.qwen25_vl.model import mrope_positions_from_ids

    B = len(ids_list)
    assert B == len(option_ids_list) and B > 0
    # per-question grids (mixed path) are a list/tuple of 3-seqs; a shared
    # grid is one flat 3-seq of ints
    mixed = isinstance(pixel_patches, list) or (
        video_grid_thw is not None
        and isinstance(video_grid_thw[0], (tuple, list, np.ndarray))
    )
    if mixed:
        return _mcq_predict_batch_mixed(
            cfg,
            params,
            ids_list,
            option_ids_list,
            pixel_patches,
            video_grid_thw,
            second_per_grid_ts,
            bucket,
            vis_bucket,
        )
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
    # same pairing guards the mixed path enforces per question — without
    # them a partial input fails deep inside vmap with an opaque axis error
    assert pixel_patches is None or video_grid_thw is not None, (
        "pixel_patches without video_grid_thw"
    )
    assert video_grid_thw is None or pixel_patches is not None, (
        "video_grid_thw without pixel_patches"
    )
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


def _mcq_predict_batch_mixed(
    cfg: ModelConfig,
    params,
    ids_list: Sequence[np.ndarray],
    option_ids_list: Sequence[Sequence[int]],
    patches_list,  # per-question Optional [S_b, patch_dim]
    grids_list,  # per-question Optional (t, h, w)
    second_per_grid_ts,  # per-question Optional float, or None
    bucket: int,
    vis_bucket: int,
) -> List[int]:
    """Mixed-grid batched MCQ (see mcq_predict_batch docstring). Vision runs
    OUTSIDE the batched LM jit as one single-grid tower dispatch per
    question (executables cached per grid — the measured B^2 multi-grid
    lesson from multistream.encode_round, multistream.py:205-216); the LM
    batch pads vision-token counts to the round max rounded up to
    `vis_bucket` and drops pad rows with out-of-bounds scatter slots."""
    import jax
    import jax.numpy as jnp

    from ..models.qwen25_vl import language as _lang
    from ..models.qwen25_vl import model
    from ..models.qwen25_vl.model import mrope_positions_from_ids

    B = len(ids_list)
    if patches_list is None:
        patches_list = [None] * B
    if grids_list is None:
        grids_list = [None] * B
    elif len(grids_list) == 3 and all(
        isinstance(x, (int, np.integer)) for x in grids_list
    ):
        # pixel_patches came as a list but the grid is one shared (t, h, w)
        grids_list = [tuple(grids_list)] * B
    assert len(patches_list) == B and len(grids_list) == B
    n_opt = len(option_ids_list[0])
    assert all(len(o) == n_opt for o in option_ids_list)
    lens = np.asarray([len(i) for i in ids_list], np.int32)
    T = int(-(-int(lens.max()) // bucket) * bucket)
    pad_id = cfg.tokens.pad
    ids = np.full((B, T), pad_id, np.int32)
    positions = np.zeros((B, 3, T), np.float32)
    embeds: List = []  # per-question [n_vis_b, D] jnp, or None
    slot_rows: List[np.ndarray] = []
    for b, row in enumerate(ids_list):
        L = len(row)
        ids[b, :L] = row
        g = grids_list[b]
        g = None if g is None else tuple(int(x) for x in g)
        spg = None
        if second_per_grid_ts is not None and second_per_grid_ts[b] is not None:
            spg = np.asarray([second_per_grid_ts[b]], np.float32)
        pos, _ = mrope_positions_from_ids(
            ids[b],
            None if g is None else np.asarray([g]),
            spatial_merge_size=cfg.vision.spatial_merge_size,
            tokens_per_second=cfg.vision.tokens_per_second,
            second_per_grid_ts=spg,
            video_token_id=cfg.tokens.video_pad,
            image_token_id=cfg.tokens.image_pad,
        )
        positions[b] = pos
        if g is None:
            assert patches_list[b] is None, "pixel_patches without grid_thw"
            embeds.append(None)
            slot_rows.append(np.zeros((0,), np.int32))
        else:
            assert patches_list[b] is not None, "grid_thw without pixel_patches"
            (s,) = np.nonzero(ids[b] == cfg.tokens.video_pad)
            emb = model.encode_video(
                cfg, params, jnp.asarray(patches_list[b]), (g,)
            )
            assert emb.shape[0] == len(s), (
                f"question {b}: grid {g} yields {emb.shape[0]} vision tokens "
                f"but the prompt has {len(s)} video_pad slots"
            )
            embeds.append(emb)
            slot_rows.append(s.astype(np.int32))

    n_vis = max((e.shape[0] for e in embeds if e is not None), default=0)
    if n_vis == 0:  # every question text-only: plain shared path
        return mcq_predict_batch(
            cfg, params, ids_list, option_ids_list, bucket=bucket
        )
    N = int(-(-n_vis // vis_bucket) * vis_bucket)
    D = next(e for e in embeds if e is not None).shape[1]
    dt = next(e for e in embeds if e is not None).dtype
    vis_rows, slots = [], np.full((B, N), T, np.int32)  # T = OOB -> dropped
    for b, (e, s) in enumerate(zip(embeds, slot_rows)):
        if e is None:
            vis_rows.append(jnp.zeros((N, D), dt))
        else:
            vis_rows.append(jnp.pad(e, ((0, N - e.shape[0]), (0, 0))))
            slots[b, : len(s)] = s
    vis = jnp.stack(vis_rows)

    key = (cfg, T, n_opt, N, "mixed")
    fn = _MCQ_BATCH_CACHE.get(key)
    if fn is None:
        tcfg = cfg.text

        @jax.jit
        def fn(params, ids, positions, vis, slots, last_idx, opt_ids):
            def one(ids1, pos1, vis1, slots1):
                emb = _lang.embed_tokens(tcfg, params["text"], ids1)
                emb = emb.at[slots1].set(vis1.astype(emb.dtype), mode="drop")
                return _lang.language_forward(tcfg, params["text"], emb, pos1)

            hidden = jax.vmap(one)(ids, positions, vis, slots)
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
        vis,
        jnp.asarray(slots),
        jnp.asarray(lens - 1),
        jnp.asarray(np.asarray(option_ids_list, np.int32)),
    )
    return [int(x) for x in np.asarray(out)]


def shard_indices(n: int, worker: int, num_workers: int) -> List[int]:
    """Round-robin sharding (reference distributed_generate_streaming.py:62)."""
    return list(range(n))[worker::num_workers]
