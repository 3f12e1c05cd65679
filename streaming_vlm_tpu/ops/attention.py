"""Pallas TPU attention kernels.

`streaming_prefill_attention`: GQA flash attention for chunk prefill over the
streaming KV arena. Replaces the jnp path that materialises
[Hkv, G, T, C] f32 logits (~0.5 GB/layer at T=640, C=12k). Two KV sources
share one online softmax:

  * the read-only arena. Two modes:
      - raw mode: K is un-rotated; RoPE applied IN-KERNEL from per-slot
        cos/sin (the TPU-native form of the reference's shrink-mode
        full-cache re-rotation, language_forward.py:184-197)
      - pre-rotated mode (acos2/asin2 = None): the caller rotated the arena
        K once per CHUNK (positions are fixed between evictions), so the
        kernel skips both the cos/sin DMA (~1 MB/tile) and the rotate VPU
        work — measured faster end-to-end, see CLAUDE.md perf notes
  * the chunk's own K/V block (pre-rotated outside; causal mask)

Softmax runs in log2 space: scale*log2(e) is folded into q once outside, the
kernel uses exp2 (TPU transcendental unit native; saves a multiply per logit).
Arena tiles fully inside the visible region skip mask construction entirely;
invisible tiles also skip their HBM->VMEM copy (index map clamps to the last
visible tile, and revisited blocks are not re-fetched).

Grid: (kv_heads, q_tiles, kv_tiles) with the kv axis innermost; running
max / denominator / accumulator persist in VMEM scratch across kv tiles
(canonical flash pattern, see /opt/skills/guides/pallas_guide.md).

This replaces the role of flash-attn's CUDA kernels in the reference
(language_forward.py:242-252).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


# ---------------------------------------------------------------------------
# Decode attention (T=1) over the pre-rotated arena
# ---------------------------------------------------------------------------


def _decode_kernel(
    visible_ref,  # [1] int32 scalar prefetch
    qp_ref,  # [R, Hkv*hd] block-diagonal Q' (pre-scaled by scale*log2e)
    ka_ref,  # [c_b, Hkv, hd] tile
    va_ref,  # [c_b, Hkv, hd] tile
    m_out,  # [R, 128]
    l_out,  # [R, 128]
    acc_out,  # [R, hd]
    m_ref,
    l_ref,
    acc_ref,
    *,
    n_tiles: int,
    c_b: int,
    hkv: int,
    g: int,
    hd: int,
):
    ik = pl.program_id(0)
    R = hkv * g

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vis = visible_ref[0]

    def accumulate(mask):
        k = ka_ref[...].reshape(c_b, hkv * hd)
        # Q' is block-diagonal over kv heads, so one [R, Hkv*hd] x [Hkv*hd,
        # c_b] dot yields per-(kv-head, group) logits without transposing the
        # arena tile (rows r = h*G+g read only their head's channels)
        logits = jax.lax.dot_general(
            qp_ref[...].astype(k.dtype),
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, c_b], log2-space
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp2(logits - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        v = va_ref[...].reshape(c_b, hkv * hd)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, Hkv*hd]
        # keep only each row's own kv-head block
        row_head = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // g
        own = jnp.zeros((R, hd), jnp.float32)
        for h in range(hkv):
            own = own + jnp.where(
                row_head == h, pv[:, h * hd : (h + 1) * hd], 0.0
            )
        acc_ref[:] = acc_ref[:] * alpha + own
        m_ref[:, :1] = m_new

    @pl.when((ik + 1) * c_b <= vis)
    def _interior():
        accumulate(None)

    @pl.when(((ik + 1) * c_b > vis) & (ik * c_b < vis))
    def _boundary():
        col = jax.lax.broadcasted_iota(jnp.int32, (1, c_b), 1)
        accumulate((ik * c_b + col) < vis)

    @pl.when(ik == n_tiles - 1)
    def _finish():
        m_out[:] = jnp.broadcast_to(m_ref[:, :1], m_out.shape)
        l_out[:] = jnp.broadcast_to(l_ref[:, :1], l_out.shape)
        acc_out[:] = acc_ref[:]


def _decode_full_kernel(
    visible_ref,  # [2] int32: [arena visible, delta visible]
    qp_ref,  # [R, Hkv*hd]
    ka_ref,  # arena tile [c_b, Hkv, hd] (last grid step: ignored)
    va_ref,
    ks_ref,  # [E1, Hkv, hd] delta+self block (constant across grid)
    vs_ref,
    out_ref,  # [R, hd]
    m_ref,
    l_ref,
    acc_ref,
    *,
    n_tiles: int,
    c_b: int,
    e1: int,
    e_delta: int,
    hkv: int,
    g: int,
    hd: int,
):
    ik = pl.program_id(0)
    R = hkv * g

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vis = visible_ref[0]
    evis = visible_ref[1]

    def accumulate(k, v, mask, rows):
        logits = jax.lax.dot_general(
            qp_ref[...].astype(k.dtype),
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, rows] log2-space
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp2(logits - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, Hkv*hd]
        row_head = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // g
        own = jnp.zeros((R, hd), jnp.float32)
        for h in range(hkv):
            own = own + jnp.where(
                row_head == h, pv[:, h * hd : (h + 1) * hd], 0.0
            )
        acc_ref[:] = acc_ref[:] * alpha + own
        m_ref[:, :1] = m_new

    is_arena = ik < n_tiles

    @pl.when(is_arena & ((ik + 1) * c_b <= vis))
    def _interior():
        accumulate(ka_ref[...].reshape(c_b, hkv * hd), va_ref[...].reshape(c_b, hkv * hd), None, c_b)

    @pl.when(is_arena & ((ik + 1) * c_b > vis) & (ik * c_b < vis))
    def _boundary():
        col = jax.lax.broadcasted_iota(jnp.int32, (1, c_b), 1)
        accumulate(
            ka_ref[...].reshape(c_b, hkv * hd),
            va_ref[...].reshape(c_b, hkv * hd),
            (ik * c_b + col) < vis,
            c_b,
        )

    @pl.when(jnp.logical_not(is_arena))
    def _small():
        # delta rows [0, e_delta) visible below evis; rows [e_delta, e1) are
        # the ALWAYS-VISIBLE self block. CONTRACT: k_small carries no padding
        # rows — e1 == e_delta + T_self exactly (both static; asserted in the
        # wrapper). A caller that ever bucket-pads k_small must extend this
        # mask with an upper bound or the pad rows' zero-K logits join the
        # softmax.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, e1), 1)
        mask = (col < evis) | (col >= e_delta)
        accumulate(
            ks_ref[...].reshape(e1, hkv * hd),
            vs_ref[...].reshape(e1, hkv * hd),
            mask,
            e1,
        )

    @pl.when(ik == n_tiles)
    def _finish():
        denom = jnp.maximum(l_ref[:, :1], 1e-20)
        out_ref[...] = (acc_ref[:] / denom).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("e_delta", "c_b", "interpret"))
def streaming_decode_attention_full(
    q_rot: jnp.ndarray,  # [H, hd] rotated single-token queries (unscaled)
    k_arena: jnp.ndarray,  # [C, Hkv, hd] PRE-ROTATED arena K
    v_arena: jnp.ndarray,
    k_small: jnp.ndarray,  # [E1, Hkv, hd] rotated delta rows ++ self row(s)
    v_small: jnp.ndarray,
    visible_len: jnp.ndarray,  # scalar int32: arena visibility
    extra_visible: jnp.ndarray,  # scalar int32: visible delta rows
    *,
    e_delta: int,  # rows of k_small before the always-visible self block
    c_b: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """COMPLETE decode attention of one token (arena + decode delta + self)
    in a single pallas call — one joint online softmax, nothing merged
    outside (v1's partial-kernel + jnp-merge form lost its bandwidth win to
    the merge's extra per-layer ops; this is the whole-op replacement for
    flash-attn decode, language_forward.py:242-252). Returns [H, hd]."""
    H, hd = q_rot.shape
    C, Hkv, _ = k_arena.shape
    G = H // Hkv
    assert C % c_b == 0, (C, c_b)
    n_tiles = C // c_b
    E1 = k_small.shape[0]
    # no-padding contract (see _small in the kernel): every row past e_delta
    # is a REAL self row, unconditionally visible
    assert E1 > e_delta, (E1, e_delta)
    qs = (q_rot.astype(jnp.float32) * (LOG2E / float(np.sqrt(hd)))).reshape(
        Hkv, G, hd
    )
    eye = jnp.eye(Hkv, dtype=qs.dtype)
    qp = (qs[:, :, None, :] * eye[:, None, :, None]).reshape(H, Hkv * hd)

    def clamp(ik, vis):
        last_vis = jnp.maximum((vis[0] + c_b - 1) // c_b - 1, 0)
        return jnp.clip(ik, 0, jnp.minimum(last_vis, n_tiles - 1))

    kernel = functools.partial(
        _decode_full_kernel,
        n_tiles=n_tiles,
        c_b=c_b,
        e1=E1,
        e_delta=e_delta,
        hkv=Hkv,
        g=G,
        hd=hd,
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles + 1,),
            in_specs=[
                pl.BlockSpec((H, Hkv * hd), lambda ik, vis: (0, 0)),
                pl.BlockSpec((c_b, Hkv, hd), lambda ik, vis: (clamp(ik, vis), 0, 0)),
                pl.BlockSpec((c_b, Hkv, hd), lambda ik, vis: (clamp(ik, vis), 0, 0)),
                pl.BlockSpec((E1, Hkv, hd), lambda ik, vis: (0, 0, 0)),
                pl.BlockSpec((E1, Hkv, hd), lambda ik, vis: (0, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((H, hd), lambda ik, vis: (0, 0))],
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, hd), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((H, hd), v_arena.dtype)],
        interpret=interpret,
    )(
        jnp.stack(
            [
                jnp.asarray(visible_len, jnp.int32),
                jnp.asarray(extra_visible, jnp.int32),
            ]
        ),
        qp,
        k_arena,
        v_arena,
        k_small,
        v_small,
    )
    return out


@functools.partial(jax.jit, static_argnames=("c_b", "interpret"))
def streaming_decode_attention(
    q_rot: jnp.ndarray,  # [H, hd] rotated single-token queries (unscaled)
    k_arena: jnp.ndarray,  # [C, Hkv, hd] PRE-ROTATED arena K
    v_arena: jnp.ndarray,  # [C, Hkv, hd]
    visible_len: jnp.ndarray,  # scalar int32
    *,
    c_b: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Partial (unnormalised) flash attention of ONE token over the arena.

    TEST-ONLY (v1, superseded): the production opt-in decode kernel is
    streaming_decode_attention_full (one joint softmax — v1's separate
    partials + jnp merge measured ~3 ms/chunk slower, CLAUDE.md negative
    result #2). Kept as the independent numeric cross-check for the v2
    kernel in tests/test_pallas_attention.py; no runtime path calls it.

    Returns log2-space online-softmax partials (m [H], l [H], acc [H, hd])
    for the caller to merge with the decode-delta/self parts (tiny, computed
    exactly outside). This is the TPU replacement for the reference's
    flash-attn decode call (language_forward.py:242-252): decode reads
    ~10 MB of K/V per layer per token, so the kernel's job is to stream the
    arena at HBM speed with the MXU doing one [R, Hkv*hd] dot per tile."""
    H, hd = q_rot.shape
    C, Hkv, _ = k_arena.shape
    G = H // Hkv
    assert C % c_b == 0, (C, c_b)
    n_tiles = C // c_b
    # block-diagonal Q': row h*G+g holds q[h*G+g] in channel block h
    qs = (q_rot.astype(jnp.float32) * (LOG2E / float(np.sqrt(hd)))).reshape(
        Hkv, G, hd
    )
    eye = jnp.eye(Hkv, dtype=qs.dtype)
    qp = (qs[:, :, None, :] * eye[:, None, :, None]).reshape(H, Hkv * hd)

    grid = (n_tiles,)

    def clamp(ik, vis):
        last_vis = jnp.maximum((vis[0] + c_b - 1) // c_b - 1, 0)
        return jnp.clip(ik, 0, jnp.minimum(last_vis, n_tiles - 1))

    kernel = functools.partial(
        _decode_kernel, n_tiles=n_tiles, c_b=c_b, hkv=Hkv, g=G, hd=hd
    )
    m, l, acc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((H, Hkv * hd), lambda ik, vis: (0, 0)),
                pl.BlockSpec((c_b, Hkv, hd), lambda ik, vis: (clamp(ik, vis), 0, 0)),
                pl.BlockSpec((c_b, Hkv, hd), lambda ik, vis: (clamp(ik, vis), 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((H, 128), lambda ik, vis: (0, 0)),
                pl.BlockSpec((H, 128), lambda ik, vis: (0, 0)),
                pl.BlockSpec((H, hd), lambda ik, vis: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, hd), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, 128), jnp.float32),
            jax.ShapeDtypeStruct((H, 128), jnp.float32),
            jax.ShapeDtypeStruct((H, hd), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(visible_len, jnp.int32).reshape(1), qp, k_arena, v_arena)
    return m[:, 0], l[:, 0], acc


def _decode_int8_kernel(
    visible_ref,  # [2] int32: [arena visible, delta visible]
    qp_ref,  # [R, Hkv*hd] block-diagonal Q' (pre-scaled by scale*log2e)
    kq_ref,  # arena K tile: [c_b, Hkv, hd] int8 (quantized) or float (raw)
    vq_ref,  # arena V tile, same representation
    freqs_ref,  # [3, hd//2] f32: inv_freq masked per mrope axis (see wrapper)
    *refs,  # [ksc, vsc] if quantized, then pos, ks_small, vs_small, out, m, l, acc
    quantized: bool,
    n_tiles: int,
    c_b: int,
    e1: int,
    e_delta: int,
    hkv: int,
    g: int,
    hd: int,
    cdt,  # compute dtype for dequantized K/V (the engine's, e.g. bf16)
):
    """Decode attention over the RAW (un-rotated, optionally int8) arena.

    The TPU answer to PROFILE_7B_B8_r04: with prerotate off (HBM-bound
    multi-stream serving) the jnp path re-materialises a dequantized AND
    rotated bf16 copy of the whole arena every decode step (3-4x the
    necessary HBM traffic). Here the arena is read ONCE per step in its
    storage form (int8 + per-(slot,head) scales); dequantization and mRoPE
    rotation happen in VMEM. cos/sin are computed on the VPU from per-slot
    positions ([C, 3] f32, 12 B/slot) instead of shipping [C, hd] cos/sin
    tables (512 B/slot — as many bytes as K itself). The per-channel
    frequency masks f0/f1/f2 implement the mrope_section split exactly:
    ang[c, ch] = pos[c, axis(ch)] * inv_freq[ch] (two terms are zero).
    Replaces the role of flash-attn decode (language_forward.py:242-252)
    for the reference's shrink-mode rotate-at-attention-time semantics
    (language_forward.py:184-197)."""
    if quantized:
        ksc_ref, vsc_ref, pos_ref, ksm_ref, vsm_ref, out_ref, m_ref, l_ref, acc_ref = refs
    else:
        pos_ref, ksm_ref, vsm_ref, out_ref, m_ref, l_ref, acc_ref = refs
        ksc_ref = vsc_ref = None
    ik = pl.program_id(0)
    R = hkv * g
    h2 = hd // 2

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vis = visible_ref[0]
    evis = visible_ref[1]

    def accumulate(k, v, mask):
        logits = jax.lax.dot_general(
            qp_ref[...].astype(k.dtype),
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, rows] log2-space
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp2(logits - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, Hkv*hd]
        row_head = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) // g
        own = jnp.zeros((R, hd), jnp.float32)
        for h in range(hkv):
            own = own + jnp.where(
                row_head == h, pv[:, h * hd : (h + 1) * hd], 0.0
            )
        acc_ref[:] = acc_ref[:] * alpha + own
        m_ref[:, :1] = m_new

    def arena_kv():
        # mRoPE angles from per-slot positions (VPU): the duplicated-half
        # convention means channel ch and ch+hd/2 share angle ch
        ang = (
            pos_ref[:, 0:1] * freqs_ref[0:1, :]
            + pos_ref[:, 1:2] * freqs_ref[1:2, :]
            + pos_ref[:, 2:3] * freqs_ref[2:3, :]
        )  # [c_b, h2] f32
        cos = jnp.cos(ang)[:, None, :]
        sin = jnp.sin(ang)[:, None, :]
        if quantized:
            # dtype chain matches the jnp path exactly (_deq_layer then
            # apply_rope): dequant -> cdt, rotate in f32, cast back to cdt
            kf = (kq_ref[...].astype(jnp.float32) * ksc_ref[...][..., None]).astype(
                cdt
            )
            v = (vq_ref[...].astype(jnp.float32) * vsc_ref[...][..., None]).astype(
                cdt
            )
        else:
            kf = kq_ref[...]
            v = vq_ref[...]
        k1 = kf[:, :, :h2]
        k2 = kf[:, :, h2:]
        k = jnp.concatenate(
            [k1 * cos - k2 * sin, k2 * cos + k1 * sin], axis=-1
        ).astype(v.dtype)
        return k.reshape(c_b, hkv * hd), v.reshape(c_b, hkv * hd)

    is_arena = ik < n_tiles

    @pl.when(is_arena & ((ik + 1) * c_b <= vis))
    def _interior():
        k, v = arena_kv()
        accumulate(k, v, None)

    @pl.when(is_arena & ((ik + 1) * c_b > vis) & (ik * c_b < vis))
    def _boundary():
        k, v = arena_kv()
        col = jax.lax.broadcasted_iota(jnp.int32, (1, c_b), 1)
        accumulate(k, v, (ik * c_b + col) < vis)

    @pl.when(jnp.logical_not(is_arena))
    def _small():
        # delta rows [0, e_delta) visible below evis; rows [e_delta, e1) are
        # the ALWAYS-VISIBLE self block (no-padding contract as in
        # _decode_full_kernel; asserted in the wrapper)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, e1), 1)
        mask = (col < evis) | (col >= e_delta)
        accumulate(
            ksm_ref[...].reshape(e1, hkv * hd),
            vsm_ref[...].reshape(e1, hkv * hd),
            mask,
        )

    @pl.when(ik == n_tiles)
    def _finish():
        denom = jnp.maximum(l_ref[:, :1], 1e-20)
        out_ref[...] = (acc_ref[:] / denom).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "e_delta", "mrope_section", "rope_theta", "c_b", "interpret"
    ),
)
def streaming_decode_attention_int8(
    q_rot: jnp.ndarray,  # [H, hd] rotated single-token queries (unscaled)
    k_q: jnp.ndarray,  # [C, Hkv, hd] RAW (un-rotated) arena K: int8 or float
    k_s: Optional[jnp.ndarray],  # [C, Hkv] f32 scales, or None (unquantized)
    v_q: jnp.ndarray,  # [C, Hkv, hd] arena V (int8 or float)
    v_s: Optional[jnp.ndarray],  # [C, Hkv] f32 scales, or None
    pos_t: jnp.ndarray,  # [C, 3] f32 per-slot mRoPE positions (transposed)
    k_small: jnp.ndarray,  # [E1, Hkv, hd] ROTATED delta rows ++ self row(s)
    v_small: jnp.ndarray,
    visible_len: jnp.ndarray,  # scalar int32: arena visibility
    extra_visible: jnp.ndarray,  # scalar int32: visible delta rows
    *,
    e_delta: int,  # rows of k_small before the always-visible self block
    mrope_section: Tuple[int, int, int],
    rope_theta: float,
    c_b: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Decode attention of one token over the RAW arena (int8 {q, s} pytree
    leaves or plain bf16) + decode delta + self, with dequantization and
    mRoPE rotation fused IN-KERNEL. One joint online softmax; the arena is
    read once per step in storage form. Returns [H, hd] (v_small dtype)."""
    H, hd = q_rot.shape
    C, Hkv, _ = k_q.shape
    G = H // Hkv
    assert C % c_b == 0, (C, c_b)
    n_tiles = C // c_b
    E1 = k_small.shape[0]
    assert E1 > e_delta, (E1, e_delta)
    quantized = k_s is not None
    assert (v_s is not None) == quantized
    h2 = hd // 2
    assert sum(mrope_section) == h2, (mrope_section, hd)
    # per-channel frequency masks: channel ch belongs to mrope axis a iff
    # ch is in section a; f_a[ch] = inv_freq[ch] there, else 0 — making
    # ang = pos0*f0 + pos1*f1 + pos2*f2 EXACT (the two foreign terms are
    # multiplications by zero)
    inv_freq = (
        1.0 / (rope_theta ** (np.arange(0, hd, 2, dtype=np.float32) / hd))
    ).reshape(1, h2)
    s0, s1, s2 = mrope_section
    ch = np.arange(h2).reshape(1, h2)
    f0 = np.where(ch < s0, inv_freq, 0.0)
    f1 = np.where((ch >= s0) & (ch < s0 + s1), inv_freq, 0.0)
    f2 = np.where(ch >= s0 + s1, inv_freq, 0.0)
    freqs = jnp.asarray(np.concatenate([f0, f1, f2], axis=0), jnp.float32)

    qs = (q_rot.astype(jnp.float32) * (LOG2E / float(np.sqrt(hd)))).reshape(
        Hkv, G, hd
    )
    eye = jnp.eye(Hkv, dtype=qs.dtype)
    qp = (qs[:, :, None, :] * eye[:, None, :, None]).reshape(H, Hkv * hd)

    def clamp(ik, vis):
        last_vis = jnp.maximum((vis[0] + c_b - 1) // c_b - 1, 0)
        return jnp.clip(ik, 0, jnp.minimum(last_vis, n_tiles - 1))

    kernel = functools.partial(
        _decode_int8_kernel,
        quantized=quantized,
        n_tiles=n_tiles,
        c_b=c_b,
        e1=E1,
        e_delta=e_delta,
        hkv=Hkv,
        g=G,
        hd=hd,
        cdt=v_small.dtype,
    )
    in_specs = [
        pl.BlockSpec((H, Hkv * hd), lambda ik, vis: (0, 0)),
        pl.BlockSpec((c_b, Hkv, hd), lambda ik, vis: (clamp(ik, vis), 0, 0)),
        pl.BlockSpec((c_b, Hkv, hd), lambda ik, vis: (clamp(ik, vis), 0, 0)),
        pl.BlockSpec((3, h2), lambda ik, vis: (0, 0)),
    ]
    inputs = [qp, k_q, v_q, freqs]
    if quantized:
        in_specs += [
            pl.BlockSpec((c_b, Hkv), lambda ik, vis: (clamp(ik, vis), 0)),
            pl.BlockSpec((c_b, Hkv), lambda ik, vis: (clamp(ik, vis), 0)),
        ]
        inputs += [k_s.astype(jnp.float32), v_s.astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((c_b, 3), lambda ik, vis: (clamp(ik, vis), 0)),
        pl.BlockSpec((E1, Hkv, hd), lambda ik, vis: (0, 0, 0)),
        pl.BlockSpec((E1, Hkv, hd), lambda ik, vis: (0, 0, 0)),
    ]
    inputs += [pos_t.astype(jnp.float32), k_small, v_small]
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles + 1,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((H, hd), lambda ik, vis: (0, 0))],
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, hd), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((H, hd), v_small.dtype)],
        interpret=interpret,
    )(
        jnp.stack(
            [
                jnp.asarray(visible_len, jnp.int32),
                jnp.asarray(extra_visible, jnp.int32),
            ]
        ),
        *inputs,
    )
    return out


def _flash_kernel(
    # scalar prefetch
    visible_ref,  # [1] int32 — arena slots < visible are attendable
    # inputs (acos/asin only present in raw mode)
    *refs,
    rotate_arena: bool,
    n_arena_tiles: int,
    n_self_tiles: int,
    c_b: int,
    t_b: int,
    g: int,
    hd: int,
):
    if rotate_arena:
        q_ref, ka_ref, va_ref, acos_ref, asin_ref, ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, ka_ref, va_ref, ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref = refs
        acos_ref = asin_ref = None

    ik = pl.program_id(2)
    it = pl.program_id(1)
    rows = t_b * g

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].reshape(rows, hd)  # row = t * G + g; pre-scaled by scale*log2e

    is_arena = ik < n_arena_tiles
    vis = visible_ref[0]

    def rotate(k, cos, sin):
        half = hd // 2
        rot = jnp.concatenate([-k[:, half:], k[:, :half]], axis=-1)
        return k * cos + rot * sin

    def accumulate(k, v, mask):
        # q is pre-multiplied by scale * log2(e): logits live in log2 space
        logits = jax.lax.dot_general(
            q.astype(k.dtype),
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(logits - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, :1] = m_new
        l_ref[:, :1] = l_new

    def arena_k():
        if rotate_arena:
            k = ka_ref[0].astype(jnp.float32)
            return rotate(k, acos_ref[:], asin_ref[:]).astype(va_ref.dtype)
        return ka_ref[0]

    # predicated branches (Mosaic legalizes side-effect-only scf.if);
    # interior tiles (fully visible) skip mask construction entirely
    @pl.when(is_arena & ((ik + 1) * c_b <= vis))
    def _arena_interior():
        accumulate(arena_k(), va_ref[0], None)

    @pl.when(is_arena & ((ik + 1) * c_b > vis) & (ik * c_b < vis))
    def _arena_boundary():
        col = jax.lax.broadcasted_iota(jnp.int32, (1, c_b), 1)
        accumulate(arena_k(), va_ref[0], (ik * c_b + col) < vis)

    @pl.when(jnp.logical_not(is_arena))
    def _self():
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, c_b), 1)
        row_t = jax.lax.broadcasted_iota(jnp.int32, (rows, c_b), 0) // g
        j = (ik - n_arena_tiles) * c_b + col
        t_global = it * t_b + row_t
        accumulate(ks_ref[0], vs_ref[0], j <= t_global)

    @pl.when(ik == n_arena_tiles + n_self_tiles - 1)
    def _finish():
        denom = jnp.maximum(l_ref[:, :1], 1e-20)
        out_ref[0] = (acc_ref[:] / denom).reshape(t_b, g, hd).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("t_b", "c_b", "interpret")
)
def streaming_prefill_attention(
    q_rot: jnp.ndarray,  # [T, H, hd] rotated queries (unscaled)
    k_arena: jnp.ndarray,  # [C, Hkv, hd] arena K — raw, or pre-rotated if acos2 is None
    v_arena: jnp.ndarray,  # [C, Hkv, hd]
    acos2: Optional[jnp.ndarray],  # [C, hd] duplicated-half cos per slot, or None
    asin2: Optional[jnp.ndarray],  # [C, hd] (None with acos2=None: pre-rotated mode)
    k_self_rot: jnp.ndarray,  # [T, Hkv, hd] rotated block K
    v_self: jnp.ndarray,  # [T, Hkv, hd]
    visible_len: jnp.ndarray,  # scalar int32
    *,
    t_b: int = 128,
    c_b: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns attention output [T, H, hd] (same dtype as v)."""
    T, H, hd = q_rot.shape
    C, Hkv, _ = k_arena.shape
    G = H // Hkv
    t_b = min(t_b, T)
    assert T % t_b == 0, (T, t_b)
    assert C % c_b == 0, (C, c_b)
    rotate_arena = acos2 is not None
    # fold softmax scale and the exp->exp2 base change into q (one small op)
    q_rot = (q_rot.astype(jnp.float32) * (LOG2E / float(np.sqrt(hd)))).astype(
        q_rot.dtype
    )
    # self block padded to a multiple of c_b
    s_pad = (-T) % c_b
    if s_pad:
        k_self_rot = jnp.pad(k_self_rot, ((0, s_pad), (0, 0), (0, 0)))
        v_self = jnp.pad(v_self, ((0, s_pad), (0, 0), (0, 0)))
    S = T + s_pad
    # [Hkv, S, hd] layouts for Mosaic-friendly blocking
    ka_h = k_arena.transpose(1, 0, 2)
    va_h = v_arena.transpose(1, 0, 2)
    ks_h = k_self_rot.transpose(1, 0, 2)
    vs_h = v_self.transpose(1, 0, 2)
    n_arena_tiles = C // c_b
    n_self_tiles = S // c_b

    # [Hkv, T/t_b, T_b, G, hd] view of q: regroup heads by kv head
    qg = q_rot.reshape(T, Hkv, G, hd).transpose(1, 0, 2, 3)

    grid = (Hkv, T // t_b, n_arena_tiles + n_self_tiles)

    def clamp_a(ik, vis):
        # last tile that holds visible slots: invisible tiles re-map to it, so
        # the pipeline skips their HBM copy (revisited blocks aren't re-fetched)
        last_vis = jnp.maximum((vis[0] + c_b - 1) // c_b - 1, 0)
        return jnp.clip(ik, 0, jnp.minimum(last_vis, n_arena_tiles - 1))

    kernel = functools.partial(
        _flash_kernel,
        rotate_arena=rotate_arena,
        n_arena_tiles=n_arena_tiles,
        n_self_tiles=n_self_tiles,
        c_b=c_b,
        t_b=t_b,
        g=G,
        hd=hd,
    )

    in_specs = [
        pl.BlockSpec(
            (1, t_b, G, hd), lambda h, it, ik, _vis: (h, it, 0, 0)
        ),  # q: [Hkv, T, G, hd]
        pl.BlockSpec(
            (1, c_b, hd),
            lambda h, it, ik, vis: (h, clamp_a(ik, vis), 0),
        ),
        pl.BlockSpec(
            (1, c_b, hd),
            lambda h, it, ik, vis: (h, clamp_a(ik, vis), 0),
        ),
    ]
    inputs = [qg, ka_h, va_h]
    if rotate_arena:
        in_specs += [
            pl.BlockSpec((c_b, hd), lambda h, it, ik, vis: (clamp_a(ik, vis), 0)),
            pl.BlockSpec((c_b, hd), lambda h, it, ik, vis: (clamp_a(ik, vis), 0)),
        ]
        inputs += [acos2, asin2]
    in_specs += [
        pl.BlockSpec(
            (1, c_b, hd),
            lambda h, it, ik, _vis: (
                h,
                jnp.clip(ik - n_arena_tiles, 0, n_self_tiles - 1),
                0,
            ),
        ),
        pl.BlockSpec(
            (1, c_b, hd),
            lambda h, it, ik, _vis: (
                h,
                jnp.clip(ik - n_arena_tiles, 0, n_self_tiles - 1),
                0,
            ),
        ),
    ]
    inputs += [ks_h, vs_h]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, t_b, G, hd), lambda h, it, ik, _vis: (h, it, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((t_b * G, 128), jnp.float32),
                pltpu.VMEM((t_b * G, 128), jnp.float32),
                pltpu.VMEM((t_b * G, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Hkv, T, G, hd), v_self.dtype),
        interpret=interpret,
    )(
        jnp.asarray(visible_len, jnp.int32).reshape(1),
        *inputs,
    )
    # [Hkv, T, G, hd] -> [T, H, hd]
    return out.transpose(1, 0, 2, 3).reshape(T, H, hd)
