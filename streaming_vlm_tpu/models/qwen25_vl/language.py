"""Qwen2.5-VL language model (decoder stack) in functional JAX.

Design (TPU-first, not a port):
  * All decoder layers are stacked along a leading axis and executed with
    `jax.lax.scan` — one compiled layer body regardless of depth.
  * The KV cache is a fixed-capacity arena `[layers, capacity, kv_heads,
    head_dim]`. K is stored UN-rotated; rotary embedding is applied to the
    arena K at attention time from a per-slot position tensor. This realises
    the reference's "shrink" semantics (un-rotated K cached, full-cache RoPE
    re-applied after contiguous re-indexing —
    /root/reference/src/streaming_vlm/inference/qwen2_5/language_forward.py:184-197)
    at flat per-token cost: the rotation is an elementwise op on K tiles the
    attention already reads.
  * Static shapes everywhere: chunk prefill is padded to bucket sizes, decode
    is length-1; the arena never changes shape.

Parity targets (file:line in /root/reference):
  * decoder layer math: src/streaming_vlm/inference/qwen2_5/language_forward.py:262-305
  * attention (eager path): language_forward.py:69-140
  * right-aligned q-slice when q_len != k_len: language_forward.py:46-56
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import TextConfig
from ...ops.quant import mm
from .rope import apply_rope, make_inv_freq, mrope_cos_sin

Params = Dict[str, Any]

NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free on fully-padded rows


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * scale.astype(jnp.float32)).astype(dtype)


def swiglu(x: jnp.ndarray, gate_w, up_w, down_w) -> jnp.ndarray:
    g = mm(x, gate_w)
    u = mm(x, up_w)
    return mm(jax.nn.silu(g) * u, down_w)


# ---------------------------------------------------------------------------
# Parameter initialisation / shape spec
# ---------------------------------------------------------------------------


def init_language_params(
    cfg: TextConfig, key: jax.Array, dtype=jnp.float32
) -> Params:
    """Random-init parameters with HF-compatible shapes (transposed to [in, out])."""
    L = cfg.num_hidden_layers
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    hd = cfg.head_dim
    I = cfg.intermediate_size
    V = cfg.vocab_size

    ks = jax.random.split(key, 12)

    def norm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params = {
        "embed": norm(ks[0], (V, D)),
        "layers": {
            "input_ln": jnp.ones((L, D), dtype),
            "q_w": norm(ks[1], (L, D, H * hd)),
            "q_b": jnp.zeros((L, H * hd), dtype),
            "k_w": norm(ks[2], (L, D, Hkv * hd)),
            "k_b": jnp.zeros((L, Hkv * hd), dtype),
            "v_w": norm(ks[3], (L, D, Hkv * hd)),
            "v_b": jnp.zeros((L, Hkv * hd), dtype),
            "o_w": norm(ks[4], (L, H * hd, D)),
            "post_ln": jnp.ones((L, D), dtype),
            "gate_w": norm(ks[5], (L, D, I)),
            "up_w": norm(ks[6], (L, D, I)),
            "down_w": norm(ks[7], (L, I, D)),
        },
        "final_ln": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm(ks[8], (D, V))
    return params


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def _gqa_attention_multi(
    q: jnp.ndarray,  # [T, H, hd] (rotated)
    kv_parts,  # list of (k [S_p, Hkv, hd] rotated, v [S_p, Hkv, hd], mask [T, S_p])
) -> jnp.ndarray:
    """GQA attention over several read-only KV sources with a joint softmax.

    The softmax is computed blockwise with a shared row max (never
    concatenating the per-source logit blocks — at C=10k that concat would
    cost ~0.5 GB of extra HBM traffic per layer). Numerically identical to a
    softmax over the concatenated keys."""
    T, H, hd = q.shape
    Hkv = kv_parts[0][0].shape[1]
    G = H // Hkv
    scale = 1.0 / np.sqrt(hd)
    qg = q.reshape(T, Hkv, G, hd)
    logit_blocks = []
    for k, v, mask in kv_parts:
        lg = jnp.einsum("tkgd,skd->kgts", qg, k, preferred_element_type=jnp.float32)
        lg = jnp.where(mask[None, None, :, :], lg * scale, NEG_INF)
        logit_blocks.append(lg)
    m = logit_blocks[0].max(axis=-1, keepdims=True)
    for lg in logit_blocks[1:]:
        m = jnp.maximum(m, lg.max(axis=-1, keepdims=True))
    denom = None
    out = None
    for lg, (k, v, mask) in zip(logit_blocks, kv_parts):
        e = jnp.exp(lg - m)
        s = e.sum(axis=-1, keepdims=True)
        o = jnp.einsum("kgts,skd->tkgd", e.astype(v.dtype), v)
        denom = s if denom is None else denom + s
        out = o if out is None else out + o
    inv = (1.0 / denom).astype(out.dtype)  # [Hkv, G, T, 1]
    out = out * inv.transpose(2, 0, 1, 3)
    return out.reshape(T, H * hd)


def _gqa_attention(q, k, v, mask):
    """Single-source GQA attention (used by tests/oracles)."""
    return _gqa_attention_multi(q, [(k, v, mask)])


def _gqa_attention_chunked(
    q: jnp.ndarray,  # [T, H, hd] (rotated)
    k: jnp.ndarray,  # [S, Hkv, hd] (rotated)
    v: jnp.ndarray,  # [S, Hkv, hd]
    mask: jnp.ndarray,  # [T, S] bool
    *,
    q_block: int,
) -> jnp.ndarray:
    """Block-recomputed (Rabe-Staats) GQA attention for TRAINING.

    The naive path materialises [Hkv, G, T, S] f32 logits — 4.3 GB per layer
    at T=8192 for the 3B geometry — and its BACKWARD keeps them live, which
    is what capped single-chip fwd+bwd at T=1024 (BENCH_TRAIN_r04.json).
    Here queries run in blocks of `q_block` under a lax.scan; each block's
    [Hkv, G, q_block, S] logits are a transient, and `jax.checkpoint` on the
    block body makes the backward RECOMPUTE them instead of saving them:
    peak memory drops from O(T*S) to O(q_block*S) in both passes at the cost
    of one extra attention-forward in backward (the standard memory-efficient
    attention trade — arXiv:2112.05682). Composes with the layer-level remat
    in language_forward (nested checkpoint) and with FSDP/PP/SP.

    Per-row math is IDENTICAL to _gqa_attention_multi with one source (same
    max-subtract softmax, same dtype chain), so the tolerance story of every
    parity test carries over. This plays the role flash-attn's training
    kernels play in the reference (language_forward.py:242-252,
    monkeypatch.py flash-attn path) for the offline/SFT stack."""
    T, H, hd = q.shape
    S, Hkv, _ = k.shape
    G = H // Hkv
    scale = 1.0 / np.sqrt(hd)
    pad = (-T) % q_block
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))  # padded rows fully masked
    nb = (T + pad) // q_block
    qb = q.reshape(nb, q_block, Hkv, G, hd)
    maskb = mask.reshape(nb, q_block, S)

    @jax.checkpoint
    def block(qi, mi):
        lg = jnp.einsum(
            "tkgd,skd->kgts", qi, k, preferred_element_type=jnp.float32
        )
        lg = jnp.where(mi[None, None, :, :], lg * scale, NEG_INF)
        m = lg.max(axis=-1, keepdims=True)
        e = jnp.exp(lg - m)
        denom = e.sum(axis=-1, keepdims=True)
        o = jnp.einsum("kgts,skd->tkgd", e.astype(v.dtype), v)
        inv = (1.0 / denom).astype(o.dtype)  # [Hkv, G, q_block, 1]
        return o * inv.transpose(2, 0, 1, 3)

    _, outs = jax.lax.scan(lambda c, xs: (c, block(*xs)), None, (qb, maskb))
    out = outs.reshape((T + pad), H * hd)
    return out[:T] if pad else out


def _decode_attention_merge(
    q: jnp.ndarray,  # [1, H, hd] rotated (unscaled)
    small_parts,  # list of (k [S, Hkv, hd] rotated, v, mask [1, S]) — tiny
    ak: jnp.ndarray,  # [C, Hkv, hd] pre-rotated arena K
    av: jnp.ndarray,
    visible_len,
    *,
    c_b: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """TEST-ONLY (v1, superseded by streaming_decode_attention_full — the
    single-call joint softmax the SVT_USE_PALLAS_DECODE path uses; this
    partial+merge form measured slower and survives only as the numeric
    cross-check in tests/test_pallas_attention.py).

    Decode attention = pallas partials over the big arena + exact jnp
    softmax over the tiny parts (decode delta + the token itself), merged in
    log2 space. Numerically identical to one softmax over the concatenated
    keys (same online-softmax algebra as the prefill kernel)."""
    from ...ops.attention import LOG2E, NEG_INF, streaming_decode_attention

    _, H, hd = q.shape
    Hkv = ak.shape[1]
    G = H // Hkv
    m_a, l_a, acc_a = streaming_decode_attention(
        q[0], ak, av, visible_len, c_b=c_b, interpret=interpret
    )  # [H], [H], [H, hd]  (log2-space)

    scale2 = LOG2E / np.sqrt(hd)
    qg = q.reshape(Hkv, G, hd)
    ks = jnp.concatenate([k for k, _, _ in small_parts], axis=0)  # [S, Hkv, hd]
    vs = jnp.concatenate([v for _, v, _ in small_parts], axis=0)
    msk = jnp.concatenate([m[0] for _, _, m in small_parts], axis=0)  # [S]
    lg = jnp.einsum(
        "kgd,skd->kgs", qg.astype(jnp.float32), ks.astype(jnp.float32)
    ) * scale2
    lg = jnp.where(msk[None, None, :], lg, NEG_INF)
    m_b = jnp.max(lg, axis=-1).reshape(H)
    p = jnp.exp2(lg - m_b.reshape(Hkv, G, 1))
    l_b = jnp.sum(p, axis=-1).reshape(H)
    acc_b = jnp.einsum("kgs,skd->kgd", p, vs.astype(jnp.float32)).reshape(H, hd)

    m_ab = jnp.maximum(m_a, m_b)
    wa = jnp.exp2(m_a - m_ab)
    wb = jnp.exp2(m_b - m_ab)
    l_tot = l_a * wa + l_b * wb
    acc = acc_a * wa[:, None] + acc_b * wb[:, None]
    out = acc / jnp.maximum(l_tot, 1e-20)[:, None]
    return out.reshape(1, H * hd).astype(av.dtype)


def _layer_body(
    cfg: TextConfig,
    hidden: jnp.ndarray,
    lp: Params,
    *,
    q_cos,
    q_sin,
    self_mask,  # [T, T] mask over the block's own keys (causal)
    context,  # list of (k [S,Hkv,hd], v [S,Hkv,hd], cos [S,f], sin [S,f], mask [T,S]);
    # cos=None marks a PRE-ROTATED k source (rotation skipped)
    arena_kernel=None,  # (ak, av, visible_len, extra_visible, c_b, interpret):
    # route the
    # FIRST context source through the pallas decode kernel (T=1 only)
    arena_kernel_q8=None,  # (akq, aks, avq, avs, pos_t, vis, evis, c_b,
    # interpret, mrope_section, rope_theta): route the FIRST context source
    # through the int8-native raw-arena decode kernel (dequant + mRoPE
    # rotation in-kernel; T=1, arena NOT pre-rotated)
    self_q_block: int = 0,  # >0: block-recomputed self attention (training
    # path, context must be empty) — never materialises [T, T] logits
):
    """One decoder layer: attention over read-only context KV sources plus the
    block's own (new) K/V. Returns (hidden, k_new, k_new_rot, v_new). Context
    sources are never written — the caller merges k_new/v_new into its arena
    afterwards (k_new_rot into a rotated-arena scratch, if it keeps one)."""
    T = hidden.shape[0]
    H = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    hd = cfg.head_dim

    x = rms_norm(hidden, lp["input_ln"], cfg.rms_norm_eps)
    q = (mm(x, lp["q_w"]) + lp["q_b"]).reshape(T, H, hd)
    k_new = (mm(x, lp["k_w"]) + lp["k_b"]).reshape(T, Hkv, hd)
    v_new = (mm(x, lp["v_w"]) + lp["v_b"]).reshape(T, Hkv, hd)

    q = apply_rope(q, q_cos[:, None, :], q_sin[:, None, :])

    parts = []
    for k_src, v, cos, sin, mask in context:
        k_rot = (
            k_src
            if cos is None
            else apply_rope(k_src, cos[:, None, :], sin[:, None, :])
        )
        parts.append((k_rot, v, mask))
    # the block's own keys (rotated with q's positions)
    k_new_rot = apply_rope(k_new, q_cos[:, None, :], q_sin[:, None, :])
    parts.append((k_new_rot, v_new, self_mask))

    if arena_kernel_q8 is not None:
        # raw (un-rotated, possibly int8) arena read in storage form; ONE
        # pallas call dequantizes + rotates in VMEM and runs the whole joint
        # softmax over arena + delta + self (the decode-traffic fix for
        # prerotate=False serving — PROFILE_7B_B8_r04)
        (akq, aks, avq, avs, pos_t, vis, evis, c_b, interpret, sec, theta) = (
            arena_kernel_q8
        )
        from ...ops.attention import streaming_decode_attention_int8

        ek = parts[0][0]
        ks_small = jnp.concatenate([ek, k_new_rot], axis=0)
        vs_small = jnp.concatenate([parts[0][1], v_new], axis=0)
        out = streaming_decode_attention_int8(
            q[0], akq, aks, avq, avs, pos_t, ks_small, vs_small, vis, evis,
            e_delta=ek.shape[0], mrope_section=sec, rope_theta=theta,
            c_b=c_b, interpret=interpret,
        )
        attn = out.reshape(1, H * hd).astype(v_new.dtype)
    elif self_q_block and not context:
        attn = _gqa_attention_chunked(
            q, k_new_rot, v_new, self_mask, q_block=self_q_block
        )
    elif arena_kernel is not None:
        # `context` held only the small (delta) source; ONE pallas call does
        # the whole joint softmax over arena + delta + self (v2 — the
        # partial-kernel + jnp-merge v1 lost its win to merge overhead)
        ak, av, vis, evis, c_b, interpret = arena_kernel
        from ...ops.attention import streaming_decode_attention_full

        ek = parts[0][0]
        ks_small = jnp.concatenate([ek, k_new_rot], axis=0)
        vs_small = jnp.concatenate([parts[0][1], v_new], axis=0)
        out = streaming_decode_attention_full(
            q[0], ak, av, ks_small, vs_small, vis, evis,
            e_delta=ek.shape[0], c_b=c_b, interpret=interpret,
        )
        attn = out.reshape(1, H * hd).astype(v_new.dtype)
    else:
        attn = _gqa_attention_multi(q, parts)
    hidden = hidden + mm(attn, lp["o_w"])
    x = rms_norm(hidden, lp["post_ln"], cfg.rms_norm_eps)
    hidden = hidden + swiglu(x, lp["gate_w"], lp["up_w"], lp["down_w"])
    return hidden, k_new, k_new_rot, v_new


def language_forward(
    cfg: TextConfig,
    params: Params,
    inputs_embeds: jnp.ndarray,  # [T, D]
    positions: jnp.ndarray,  # [3, T] float32
    attn_mask: Optional[jnp.ndarray] = None,  # [T, T] bool; default causal
    remat: str = "none",  # {"none", "full", "dots"} activation checkpointing
    attn_q_block: Optional[int] = None,  # block-recomputed attention:
    # None = auto (on at T >= 2048, q_block 512), 0 = off (naive [T, T]
    # logits), >0 = force that block size (tests)
) -> jnp.ndarray:
    """Offline / training decoder stack: plain causal self-attention.
    Returns hidden [T, D] post-final-norm.

    `remat` rematerialises per-layer activations in the backward pass (the
    reference trains with gradient_checkpointing — scripts/sft_stage_1.sh:45):
    "full" saves only the [T, D] inter-layer carry (every intermediate —
    including the dominant [T, I] MLP activations — is recomputed in the
    backward), "dots" additionally saves matmul outputs with no batch dims
    (less recompute, more memory). Without remat, 3B at T=8192 keeps ~180 MB
    of [T, I] activations live per layer for backward (x36 layers ~ 6.5 GB);
    with "full" the saved state is the [T, D] carry (~34 MB/layer)."""
    T = inputs_embeds.shape[0]
    inv_freq = jnp.asarray(make_inv_freq(cfg.head_dim, cfg.rope_theta))
    q_cos, q_sin = mrope_cos_sin(positions, inv_freq, cfg.mrope_section)
    if attn_mask is None:
        attn_mask = jnp.tril(jnp.ones((T, T), bool))
    if attn_q_block is None:
        # auto: past T=2048 the naive [Hkv, G, T, T] f32 logits (and their
        # saved copy in backward) dominate memory — switch to the
        # block-recomputed form (see _gqa_attention_chunked)
        attn_q_block = 512 if T >= 2048 else 0

    def scan_fn(hidden, lp):
        hidden, _, _, _ = _layer_body(
            cfg, hidden, lp, q_cos=q_cos, q_sin=q_sin, self_mask=attn_mask,
            context=[], self_q_block=attn_q_block,
        )
        return hidden, None

    if remat != "none":
        policy = (
            None  # save nothing: recompute the whole layer in backward
            if remat == "full"
            else jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
        scan_fn = jax.checkpoint(scan_fn, policy=policy, prevent_cse=False)

    hidden, _ = jax.lax.scan(scan_fn, inputs_embeds, params["layers"])
    return rms_norm(hidden, params["final_ln"], cfg.rms_norm_eps)


def language_forward_streaming(
    cfg: TextConfig,
    params: Params,
    inputs_embeds: jnp.ndarray,  # [T, D]
    q_positions: jnp.ndarray,  # [3, T] float32
    *,
    arena: Tuple[jnp.ndarray, jnp.ndarray],  # READ-ONLY [L, C, Hkv, hd] x2
    arena_positions: Optional[jnp.ndarray] = None,  # [3, C] float32 (raw-K mode)
    visible_len: jnp.ndarray,  # scalar int32: arena slots < visible_len attendable
    arena_rotated: bool = False,  # arena K already rotated for this chunk's positions
    extra: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # [L, E, Hkv, hd] x2
    extra_positions: Optional[jnp.ndarray] = None,  # [3, E]
    extra_visible: Optional[jnp.ndarray] = None,  # scalar int32
    extra_rotated: bool = False,  # extra K already rotated
    self_mask: Optional[jnp.ndarray] = None,  # [T, T]; default causal
    use_pallas: Optional[bool] = None,  # None = auto (TPU backend, prefill only)
    use_decode_int8: Optional[bool] = None,  # raw-arena decode kernel:
    # None = auto (env SVT_USE_PALLAS_DECODE_INT8, TPU backends only),
    # True = force (interpret mode off-TPU), False = off
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Streaming decoder stack over a read-only KV arena (+ optional small
    read-only `extra` block, e.g. the decode delta). The arena is NEVER
    copied or carried through the scan — only its per-layer slices are read;
    the new block's K/V come back as [L, T, Hkv, hd] (raw K, rotated K, V)
    for the caller to merge with one dynamic_update_slice each.

    K rotation semantics (the reference's shrink mode,
    language_forward.py:184-197): the persistent arena holds UN-rotated K and
    positions are contiguous-re-indexed at eviction. Within one chunk the
    positions are fixed, so the caller normally rotates the arena ONCE per
    chunk (`arena_rotated=True`) instead of per attention call — that is what
    makes the per-token decode cost flat AND cheap (no per-step cos/sin DMA
    or rotate VPU work). `arena_rotated=False` rotates in-place from
    `arena_positions` (used by tests/oracles and one-shot calls)."""
    T = inputs_embeds.shape[0]
    C = arena_capacity(arena[0])
    cdt = inputs_embeds.dtype  # compute dtype for dequantized arena slices
    inv_freq = jnp.asarray(make_inv_freq(cfg.head_dim, cfg.rope_theta))
    q_cos, q_sin = mrope_cos_sin(q_positions, inv_freq, cfg.mrope_section)
    if arena_rotated:
        a_cos = a_sin = None
    else:
        a_cos, a_sin = mrope_cos_sin(arena_positions, inv_freq, cfg.mrope_section)
    arena_mask = jnp.broadcast_to(
        (jnp.arange(C) < visible_len)[None, :], (T, C)
    )
    custom_self_mask = self_mask is not None
    if self_mask is None:
        self_mask = jnp.tril(jnp.ones((T, T), bool))

    if use_pallas is None:
        # Default ON for TPU prefill: in-graph (inside the layer scan) the
        # flash kernel beats the XLA-fused path end-to-end (4.98 vs 4.65
        # ingest FPS on v5e-1); standalone-dispatch microbenchmarks are
        # misleading on this runtime. SVT_USE_PALLAS_ATTN=0 disables.
        # The kernel hard-codes a CAUSAL self mask, so the auto gate must
        # never fire for a caller-supplied self_mask.
        import os

        use_pallas = (
            os.environ.get("SVT_USE_PALLAS_ATTN", "1") != "0"
            and jax.default_backend() in ("tpu", "axon")
            and extra is None
            and not custom_self_mask
            and T >= 64
            and T % 64 == 0
            and C % 512 == 0
        )
    if use_pallas and extra is None:
        # NOTE: the kernel hard-codes a causal self mask; callers with custom
        # self_mask must pass use_pallas=False (the engine only customises the
        # mask on the decode/extra path, which never reaches here)
        from ...ops.attention import streaming_prefill_attention

        H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        if arena_rotated:
            acos2 = asin2 = None
        else:
            acos2 = jnp.concatenate([a_cos, a_cos], axis=-1)
            asin2 = jnp.concatenate([a_sin, a_sin], axis=-1)
        interpret = jax.default_backend() not in ("tpu", "axon")

        def scan_fn_pallas(hidden, xs):
            lp, ak, av = xs
            ak, av = _deq_layer(ak, cdt), _deq_layer(av, cdt)
            x = rms_norm(hidden, lp["input_ln"], cfg.rms_norm_eps)
            q = (mm(x, lp["q_w"]) + lp["q_b"]).reshape(T, H, hd)
            k_new = (mm(x, lp["k_w"]) + lp["k_b"]).reshape(T, Hkv, hd)
            v_new = (mm(x, lp["v_w"]) + lp["v_b"]).reshape(T, Hkv, hd)
            q = apply_rope(q, q_cos[:, None, :], q_sin[:, None, :])
            k_self_rot = apply_rope(k_new, q_cos[:, None, :], q_sin[:, None, :])
            attn = streaming_prefill_attention(
                q,
                ak,
                av,
                acos2,
                asin2,
                k_self_rot,
                v_new,
                visible_len,
                t_b=128 if T % 128 == 0 else 64,
                # measured on v5e: c_b=1024 is ~19% faster than 512 (fewer
                # online-softmax rescale passes); larger t_b fails to compile
                # (VMEM) and bf16 cos/sin gains nothing (not DMA-bound)
                c_b=1024 if C % 1024 == 0 else 512,
                interpret=interpret,
            ).reshape(T, H * hd)
            hidden = hidden + mm(attn, lp["o_w"])
            x = rms_norm(hidden, lp["post_ln"], cfg.rms_norm_eps)
            hidden = hidden + swiglu(x, lp["gate_w"], lp["up_w"], lp["down_w"])
            return hidden, (k_new, k_self_rot, v_new)

        hidden, (k_block, k_block_rot, v_block) = jax.lax.scan(
            scan_fn_pallas, inputs_embeds, (params["layers"], arena[0], arena[1])
        )
        hidden = rms_norm(hidden, params["final_ln"], cfg.rms_norm_eps)
        return hidden, (k_block, k_block_rot, v_block)

    if extra is not None:
        E = extra[0].shape[1]
        if extra_rotated:
            e_cos = e_sin = None
        else:
            e_cos, e_sin = mrope_cos_sin(extra_positions, inv_freq, cfg.mrope_section)
        extra_mask = jnp.broadcast_to(
            (jnp.arange(E) < extra_visible)[None, :], (T, E)
        )

        # Decode (T=1) arena attention through the pallas partial-softmax
        # kernel + outside merge. MEASURED SLOWER than the fused-jnp
        # multi-source softmax on v5e (8.24 vs 8.35 FPS e2e): the per-layer
        # pallas dispatch inside the double scan plus the merge's extra small
        # ops outweigh the kernel's bandwidth win at Hkv=2, C=10240. Kept
        # opt-in via SVT_USE_PALLAS_DECODE=1 (correctness-tested); default
        # stays on the jnp path.
        import os

        use_decode_kernel = (
            os.environ.get("SVT_USE_PALLAS_DECODE", "0") == "1"
            and jax.default_backend() in ("tpu", "axon")
            and T == 1
            and arena_rotated
            and extra_rotated
            and C % 1024 == 0
        )
        # int8-native raw-arena decode kernel (dequant + mRoPE rotation
        # IN-KERNEL from per-slot positions). MEASURED NEGATIVE at 7B B=8
        # (BENCH_AB_DECODE_INT8_r05: 0.711x, ci95 +-0.003): the in-kernel
        # int8->float convert is VPU-throughput-bound (~217 GB/s — r2's
        # weight-only precedent) and cos/sin recompute per (layer, lane,
        # tile) is 36x redundant, while XLA's fused path pays the convert
        # once per big pass. Default OFF; =1 opt-in on TPU, =force off-TPU
        # (interpret mode — CPU equivalence tests). The production answer
        # to the prerotate-OOM problem is rot_quant="int8" (engine).
        q8_env = os.environ.get("SVT_USE_PALLAS_DECODE_INT8", "0")
        q8_cb_env = os.environ.get("SVT_DECODE_INT8_CB")
        if q8_cb_env:
            q8_cb = int(q8_cb_env)
        else:
            # VMEM-fit default: the kernel's in-flight tile footprint scales
            # with c_b * Hkv * hd (int8 K/V tiles + f32 dequant/rotate
            # transients). c_b=1024 fits the 3B geometry (Hkv*hd=256);
            # the 7B geometry (Hkv*hd=512) measured 22 MB > the 16 MB
            # scoped-vmem limit at 1024 — use 512 there.
            q8_cb = 1024 if cfg.num_key_value_heads * cfg.head_dim <= 256 else 512
        if C % q8_cb:
            q8_cb = 512
        if use_decode_int8 is None:
            q8_enabled = q8_env != "0" and (
                jax.default_backend() in ("tpu", "axon") or q8_env == "force"
            )
        else:
            q8_enabled = use_decode_int8
        use_decode_kernel_q8 = (
            q8_enabled
            and not use_decode_kernel
            and T == 1
            and not arena_rotated
            and extra_rotated
            and not custom_self_mask
            and C % q8_cb == 0
        )
        dec_cb = 2048 if C % 2048 == 0 else 1024
        dec_interp = jax.default_backend() not in ("tpu", "axon")
        if use_decode_kernel_q8:
            pos_t = arena_positions.astype(jnp.float32).T  # [C, 3], tiny

        def scan_fn(hidden, xs):
            lp, ak, av, ek, ev = xs
            ak_kernel = ak_kernel_q8 = None
            if use_decode_kernel_q8:
                from ...ops.quant import is_kv_quantized

                if is_kv_quantized(ak):
                    akq, aks, avq, avs = ak["q"], ak["s"], av["q"], av["s"]
                else:
                    akq, aks, avq, avs = ak, None, av, None
                ctx = [(ek, ev, e_cos, e_sin, extra_mask)]
                ak_kernel_q8 = (
                    akq, aks, avq, avs, pos_t, visible_len, extra_visible,
                    q8_cb, dec_interp, cfg.mrope_section, cfg.rope_theta,
                )
            elif use_decode_kernel:
                ak, av = _deq_layer(ak, cdt), _deq_layer(av, cdt)
                ctx = [(ek, ev, e_cos, e_sin, extra_mask)]
                ak_kernel = (ak, av, visible_len, extra_visible, dec_cb, dec_interp)
            else:
                ak, av = _deq_layer(ak, cdt), _deq_layer(av, cdt)
                ctx = [(ak, av, a_cos, a_sin, arena_mask), (ek, ev, e_cos, e_sin, extra_mask)]
            hidden, kn, knr, vn = _layer_body(
                cfg, hidden, lp, q_cos=q_cos, q_sin=q_sin, self_mask=self_mask,
                context=ctx, arena_kernel=ak_kernel, arena_kernel_q8=ak_kernel_q8,
            )
            return hidden, (kn, knr, vn)

        hidden, (k_block, k_block_rot, v_block) = jax.lax.scan(
            scan_fn,
            inputs_embeds,
            (params["layers"], arena[0], arena[1], extra[0], extra[1]),
        )
    else:

        def scan_fn(hidden, xs):
            lp, ak, av = xs
            ak, av = _deq_layer(ak, cdt), _deq_layer(av, cdt)
            ctx = [(ak, av, a_cos, a_sin, arena_mask)]
            hidden, kn, knr, vn = _layer_body(
                cfg, hidden, lp, q_cos=q_cos, q_sin=q_sin, self_mask=self_mask, context=ctx
            )
            return hidden, (kn, knr, vn)

        hidden, (k_block, k_block_rot, v_block) = jax.lax.scan(
            scan_fn, inputs_embeds, (params["layers"], arena[0], arena[1])
        )

    hidden = rms_norm(hidden, params["final_ln"], cfg.rms_norm_eps)
    return hidden, (k_block, k_block_rot, v_block)


def embed_tokens(cfg: TextConfig, params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"], input_ids, axis=0)


def lm_logits(cfg: TextConfig, params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """[T, D] -> [T, V] float32 logits."""
    if "lm_head_q" in params:  # quantized copy of the tied embedding.T
        return mm(hidden, params["lm_head_q"], out_dtype=jnp.float32)
    if not cfg.tie_word_embeddings and isinstance(params.get("lm_head"), dict):
        return mm(hidden, params["lm_head"], out_dtype=jnp.float32)
    w = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    return jnp.dot(hidden, w, preferred_element_type=jnp.float32)


def init_kv_arena(
    cfg: TextConfig, capacity: int, dtype=jnp.bfloat16, quant: str = "none",
    lead_dims: Tuple[int, ...] = (),
):
    """Allocate the [L, C, Hkv, hd] K/V arenas (lead_dims prepends axes —
    the multi-stream engine's stacked [B, ...] lanes). quant="int8" stores
    each as a {"q": int8, "s": f32 [..., Hkv]} pytree (ops/quant.py
    quantize_kv) — half the HBM; every consumer dequantizes per layer
    inside its scan."""
    shape = lead_dims + (
        cfg.num_hidden_layers, capacity, cfg.num_key_value_heads, cfg.head_dim
    )
    if quant == "int8":
        from ...ops.quant import quantize_kv

        z = jax.jit(quantize_kv)(jnp.zeros(shape, dtype))
        return z, jax.tree_util.tree_map(jnp.copy, z)
    assert quant == "none", quant
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def arena_capacity(arena) -> int:
    """Slot count of an arena in either representation."""
    return (arena["q"] if isinstance(arena, dict) else arena).shape[1]


def _deq_layer(x, dtype):
    """Dequantize one layer's arena slice inside the decoder scan (no-op for
    an unquantized arena). The bf16 transient is one layer — [C, Hkv, hd] —
    not a full-arena copy."""
    from ...ops.quant import dequantize_kv, is_kv_quantized

    return dequantize_kv(x, dtype) if is_kv_quantized(x) else x
