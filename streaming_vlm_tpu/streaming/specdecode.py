"""Speculative decoding scaffolding over the streaming engine.

Why: at the reference checkpoint's size (7B) decode dominates the chunk
(~76% of ~347 ms on v5e-1, tools/profile_pieces.py --model 7b) and the dense
step already streams weights at ~81% of HBM peak — an architectural >1.5x
decode lever needs FEWER target forwards per token, i.e. speculative
decoding (SpecVLM, PAPERS.md). Acceptance rates are meaningless on random
weights, so this module ships the full mechanism + correctness guarantees
now and defers acceptance-rate/performance claims to a real checkpoint
(VERDICT r2 next #8).

Mechanism (deterministic-draft speculative sampling):
  * a host-side draft proposes up to k tokens from the committed context
    (NGramDraft below, or any callable(context_ids, k) -> ids);
  * one jitted `spec_verify_step` forwards [pending, d_1..d_k] through the
    target over the arena + decode delta (T=k+1 — a small prefill, not k+1
    decode dispatches), computes target logits at every position, and runs
    the acceptance rule IN-GRAPH (only token ids cross the host boundary —
    a [k+1, V] logits transfer would cost seconds over the axon tunnel);
  * greedy: accept d_j while it equals the penalised argmax — emitted
    tokens are EXACTLY the autoregressive stream (tested);
  * sampling: accept d_j with prob p(d_j), else resample from the residual
    (p with p[d_j] zeroed, renormalised) — the standard speculative-sampling
    rule for a deterministic draft, so emitted tokens are distributed
    exactly as autoregressive sampling;
  * KV of the pending token and accepted drafts is valid (their context
    prefix is committed) and lands in the decode delta; rejected rows are
    overwritten by the next round. The final pending token never gets KV —
    it re-prefills with the next chunk via the engine's `uncached_tail`,
    the same path as the forced <|im_end|>.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.qwen25_vl import language
from ..ops.quant import dequantize_kv
from ..ops.sampling import apply_repetition_penalty
from .engine import _merge_block, positions_from_descriptors

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SpecStatics:
    cfg: ModelConfig
    t_pad: int
    k_pad: int  # verify width: 1 pending + (k_pad - 1) draft slots
    n_delta: int  # decode-delta buffer length (max_new + k_pad slack)
    temperature: float
    repetition_penalty: float
    do_sample: bool
    max_new: int
    eos_threshold: Optional[Tuple[int, float, float]] = None
    use_descriptors: bool = False


@partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3, 8))
def spec_prefill_step(
    statics: SpecStatics,
    params: Params,
    k_arena: jnp.ndarray,
    v_arena: jnp.ndarray,
    slot_positions,
    tokens: jnp.ndarray,  # [t_pad]
    vis_embeds: Optional[jnp.ndarray],
    vis_slots: Optional[jnp.ndarray],
    ids_arena: jnp.ndarray,
    insert_at: jnp.ndarray,
    n_real: jnp.ndarray,
    eos_id: jnp.ndarray,
    rng: jax.Array,
):
    """Chunk prefill (identical semantics to chunk_step's prefill phase) +
    the FIRST sampled token. Returns (k_arena, v_arena, ids_arena, k_rot,
    pending0, presence, delta_pos, rng) — k_rot is the fully-rotated arena
    (incl. the merged chunk block) the verify rounds read."""
    from ..models.qwen25_vl.rope import apply_rope, make_inv_freq, mrope_cos_sin
    from ..ops.sampling import sample_token

    rng, key0 = jax.random.split(rng)
    cfg = statics.cfg
    tcfg = cfg.text
    C = language.arena_capacity(k_arena)
    kv_quantized = isinstance(k_arena, dict)
    adt = params["text"]["embed"].dtype if kv_quantized else k_arena.dtype
    if statics.use_descriptors:
        slot_positions = positions_from_descriptors(slot_positions, C)

    inv_freq = jnp.asarray(make_inv_freq(tcfg.head_dim, tcfg.rope_theta))
    a_cos, a_sin = mrope_cos_sin(slot_positions, inv_freq, tcfg.mrope_section)
    # int8 arena: dequantize fuses into this one rotate pass (same shape as
    # chunk_step's prerotate path); k_rot itself stays in the engine dtype
    k_full = dequantize_kv(k_arena, adt) if kv_quantized else k_arena
    k_rot = apply_rope(k_full, a_cos[:, None, :], a_sin[:, None, :])

    ids_arena = jax.lax.dynamic_update_slice(ids_arena, tokens, (insert_at,))
    valid = jnp.arange(C) < (insert_at + n_real)
    scatter_ids = jnp.where(valid, ids_arena, tcfg.vocab_size)
    presence = (
        jnp.zeros(tcfg.vocab_size, jnp.bool_).at[scatter_ids].set(True, mode="drop")
    )

    embeds = language.embed_tokens(tcfg, params["text"], tokens)
    if vis_embeds is not None:
        embeds = embeds.at[vis_slots].set(vis_embeds.astype(embeds.dtype))
    q_pos = jax.lax.dynamic_slice(slot_positions, (0, insert_at), (3, statics.t_pad))

    hidden, (k_block, k_block_rot, v_block) = language.language_forward_streaming(
        tcfg,
        params["text"],
        embeds,
        q_pos,
        arena=(k_rot, v_arena),
        arena_rotated=True,
        visible_len=insert_at,
    )
    k_arena = _merge_block(k_arena, k_block, insert_at)
    k_rot = jax.lax.dynamic_update_slice(
        k_rot, k_block_rot.astype(adt), (0, insert_at, 0, 0)
    )
    v_arena = _merge_block(v_arena, v_block, insert_at)
    last_hidden = jax.lax.dynamic_slice(hidden, (n_real - 1, 0), (1, hidden.shape[1]))
    logits0 = language.lm_logits(tcfg, params["text"], last_hidden)[0]

    if statics.eos_threshold is not None:
        tok_id, base, _step = statics.eos_threshold
        prob = jax.nn.softmax(logits0)[tok_id]
        logits0 = jnp.where(
            (jnp.arange(logits0.shape[0]) == tok_id) & (prob <= base),
            -jnp.inf,
            logits0,
        )
    pending0 = sample_token(
        key0,
        logits0,
        presence,
        temperature=statics.temperature,
        repetition_penalty=statics.repetition_penalty,
        do_sample=statics.do_sample,
    )
    presence = presence.at[pending0].set(True)

    decode_base = insert_at + n_real
    delta_pos = jax.lax.dynamic_slice(
        slot_positions, (0, decode_base), (3, statics.n_delta)
    )
    return k_arena, v_arena, ids_arena, k_rot, pending0, presence, delta_pos, rng


@partial(jax.jit, static_argnums=(0,), donate_argnums=(4, 5, 6, 7))
def spec_verify_step(
    statics: SpecStatics,
    params: Params,
    k_rot: jnp.ndarray,  # [L, C, Hkv, hd] read-only (rotated, incl. chunk)
    v_arena: jnp.ndarray,  # read-only
    dk: jnp.ndarray,  # [L, n_delta, Hkv, hd] donated
    dkr: jnp.ndarray,
    dv: jnp.ndarray,
    presence: jnp.ndarray,  # [V] bool donated
    pending: jnp.ndarray,  # scalar int32 — emitted, no KV yet
    draft: jnp.ndarray,  # [k_pad - 1] int32 proposals (padded)
    n_draft: jnp.ndarray,  # scalar int32 — valid proposals
    n_delta_cur: jnp.ndarray,  # scalar int32 — valid delta rows
    decode_base: jnp.ndarray,  # scalar int32
    emitted_total: jnp.ndarray,  # scalar int32 — tokens emitted so far
    delta_pos: jnp.ndarray,  # [3, n_delta]
    eos_id: jnp.ndarray,
    rng: jax.Array,
):
    """One speculative round: forward [pending, draft...] (T=k_pad), accept
    in-graph, write the valid rows' KV into the delta. Returns
    (dk, dkr, dv, presence, pending', emitted [k_pad], n_emit, n_keep,
    done, rng)."""
    cfg = statics.cfg
    tcfg = cfg.text
    K = statics.k_pad
    rng, key = jax.random.split(rng)

    inputs = jnp.concatenate([pending[None], draft])  # [K]
    pos = jax.lax.dynamic_slice(delta_pos, (0, n_delta_cur), (3, K))
    emb = language.embed_tokens(tcfg, params["text"], inputs)
    hidden, (k1, k1r, v1) = language.language_forward_streaming(
        tcfg,
        params["text"],
        emb,
        pos,
        arena=(k_rot, v_arena),
        arena_rotated=True,
        visible_len=decode_base,
        extra=(dkr, dv),
        extra_rotated=True,
        extra_visible=n_delta_cur,
    )
    logits_all = language.lm_logits(tcfg, params["text"], hidden)  # [K, V]
    adt = dk.dtype
    dk = jax.lax.dynamic_update_slice(dk, k1.astype(adt), (0, n_delta_cur, 0, 0))
    dkr = jax.lax.dynamic_update_slice(dkr, k1r.astype(adt), (0, n_delta_cur, 0, 0))
    dv = jax.lax.dynamic_update_slice(dv, v1.astype(adt), (0, n_delta_cur, 0, 0))

    V = logits_all.shape[1]

    def accept_body(carry, j):
        presence, still, done, rng = carry
        rng, k1_, k2_ = jax.random.split(rng, 3)
        logits = logits_all[j]
        if statics.eos_threshold is not None:
            tok_id, base, step_sz = statics.eos_threshold
            thr = base + step_sz * (emitted_total + j).astype(jnp.float32)
            prob = jax.nn.softmax(logits)[tok_id]
            logits = jnp.where(
                (jnp.arange(V) == tok_id) & (prob <= thr), -jnp.inf, logits
            )
        scores = apply_repetition_penalty(
            logits, presence, statics.repetition_penalty
        )
        d = jnp.where(j < K - 1, inputs[jnp.minimum(j + 1, K - 1)], eos_id)
        is_draft_pos = j < n_draft
        if statics.do_sample:
            probs = jax.nn.softmax(scores / max(statics.temperature, 1e-6))
            u = jax.random.uniform(k1_)
            accept = is_draft_pos & (u < probs[d])
            # residual for a deterministic draft: zero the rejected draft
            # token's mass and renormalise (exact speculative sampling)
            resid = jnp.where(
                is_draft_pos & (jnp.arange(V) == d), 0.0, probs
            )
            sampled = jax.random.categorical(
                k2_, jnp.log(jnp.maximum(resid, 1e-30))
            ).astype(jnp.int32)
            tok = jnp.where(accept, d, sampled)
        else:
            t = jnp.argmax(scores).astype(jnp.int32)
            accept = is_draft_pos & (t == d)
            tok = t
        # budget: never emit past max_new in total
        can_emit = still & ~done & (emitted_total + j < statics.max_new)
        tok = jnp.where(can_emit, tok, eos_id)
        presence = jnp.where(can_emit, presence.at[tok].set(True), presence)
        now_done = done | (can_emit & (tok == eos_id))
        # continue accepting only while this position was an emitted,
        # accepted draft (a rejection emits the bonus token and stops)
        next_still = still & accept & can_emit & ~now_done
        return (presence, next_still, now_done, rng), (tok, can_emit, accept & can_emit)

    (presence, _, done, rng), (emitted, emit_mask, acc_mask) = jax.lax.scan(
        accept_body,
        (presence, jnp.asarray(True), jnp.asarray(False), key),
        jnp.arange(K),
    )
    n_emit = jnp.sum(emit_mask).astype(jnp.int32)
    # delta rows with VALID KV from this round: the pending row (always an
    # input with committed context) + one input row per accepted draft. The
    # last emitted token, when it is a bonus/resample, was NOT an input —
    # it becomes pending' and gets its KV next round (or re-prefills via
    # uncached_tail at chunk end). When the chain ends on an accepted draft
    # (eos or budget), every emitted token has KV and pending' is moot.
    n_keep = 1 + jnp.sum(acc_mask).astype(jnp.int32)
    pending_new = emitted[jnp.maximum(n_emit - 1, 0)]
    return dk, dkr, dv, presence, pending_new, emitted, n_emit, n_keep, done, rng


@partial(jax.jit, donate_argnums=(0, 1, 2))
def spec_commit_step(
    k_arena: jnp.ndarray,
    v_arena: jnp.ndarray,
    ids_arena: jnp.ndarray,
    dk: jnp.ndarray,
    dv: jnp.ndarray,
    emitted: jnp.ndarray,  # [n_delta] int32 (padded)
    decode_base: jnp.ndarray,
):
    """Merge the spec-decode delta + emitted ids into the arena (one
    dispatch; the AR chunk_step does this inside its own graph). The deltas
    are engine-dtype; _merge_block quantizes them per slot when the arena is
    int8 (StreamConfig.kv_quant)."""
    k_arena = _merge_block(k_arena, dk, decode_base)
    v_arena = _merge_block(v_arena, dv, decode_base)
    ids_arena = jax.lax.dynamic_update_slice(ids_arena, emitted, (decode_base,))
    return k_arena, v_arena, ids_arena


# ---------------------------------------------------------------------------
# Host-side drafts
# ---------------------------------------------------------------------------


class NGramDraft:
    """Suffix-match draft: find the most recent earlier occurrence of the
    last `n` committed tokens and propose its continuation. Zero model cost;
    works when commentary repeats phrases (sports casts do). Returns fewer
    than k proposals (possibly none) when no match exists."""

    def __init__(self, n: int = 2, history_limit: int = 8192):
        self.n = n
        self.history_limit = history_limit
        self._hist: list = []

    def observe(self, ids) -> None:
        self._hist.extend(int(t) for t in np.asarray(ids).reshape(-1))
        if len(self._hist) > self.history_limit:
            self._hist = self._hist[-self.history_limit :]

    def __call__(self, context_ids: np.ndarray, k: int) -> np.ndarray:
        hist = self._hist + [int(t) for t in np.asarray(context_ids).reshape(-1)]
        n = self.n
        if len(hist) < n + 1:
            return np.zeros(0, np.int32)
        key = hist[-n:]
        # scan backwards for the most recent earlier match
        for i in range(len(hist) - n - 1, n - 1, -1):
            if hist[i - n : i] == key:
                cont = hist[i : i + k]
                return np.asarray(cont, np.int32)
        return np.zeros(0, np.int32)


class FixedDraft:
    """Test draft: replays a fixed token sequence, self-aligned by matching
    the longest prefix of its sequence that already ends the context
    (clairvoyant when fed the AR output — near-100% acceptance; adversarial
    when fed garbage — 0%)."""

    def __init__(self, tokens):
        self.tokens = [int(t) for t in np.asarray(tokens, np.int32).reshape(-1)]

    def observe(self, ids) -> None:
        pass

    def __call__(self, context_ids: np.ndarray, k: int) -> np.ndarray:
        ctx = [int(t) for t in np.asarray(context_ids).reshape(-1)]
        toks = self.tokens
        for i in range(len(toks), -1, -1):
            if i <= len(ctx) and (i == 0 or ctx[-i:] == toks[:i]):
                return np.asarray(toks[i : i + k], np.int32)
        return np.zeros(0, np.int32)
