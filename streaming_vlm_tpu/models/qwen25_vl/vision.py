"""Qwen2.5-VL vision tower (windowed ViT) in functional JAX.

Design (TPU-first):
  * The window permutation, segment structure, and 2-D rotary position ids are
    pure functions of `grid_thw` — computed once per resolution on the host
    (numpy, memoised) and shipped to the device as static-shaped index arrays.
  * Windowed / full attention both become segment-masked dense attention over
    the (window-reordered) sequence; a Pallas varlen kernel slots in behind
    the same interface (ops/attention.py).
  * All `depth` blocks run under one `lax.scan`; the per-block choice of
    window vs. full segments (fullatt_block_indexes) is a scanned boolean
    selecting between two masks.

Parity targets (file:line in /root/reference):
  * encoder layout: src/streaming_vlm/inference/qwen2_5/vision_forward.py:57-101
  * block/attention math: vision_forward.py:6-54 (flash-attn varlen over
    cu_seqlens; here: segment mask, same softmax math)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import VisionConfig
from ...ops.quant import mm
from .language import NEG_INF, rms_norm
from .rope import apply_rope

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Host-side geometry (memoised per grid)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def vision_geometry(
    grid_thw: Tuple[Tuple[int, int, int], ...],
    window_size: int,
    spatial_merge_size: int,
    patch_size: int,
    use_windows: bool = True,
) -> Dict[str, np.ndarray]:
    """Compute, for a tuple of (t, h, w) grids:
      * pos_ids      [S, 2]  (h, w) rotary position ids per patch token
      * window_index [S // merge_unit] permutation of merge-units
      * win_seg      [S] window segment id (after reordering)
      * full_seg     [S] full-attention segment id (after reordering)
      * reverse      [S // merge_unit] inverse permutation

    Mirrors Qwen2.5-VL's rot_pos_emb / get_window_index exactly.
    """
    merge = spatial_merge_size
    unit = merge * merge
    vit_ws = window_size // merge // patch_size  # llm-grid cells per window side

    pos_list = []
    win_index_parts = []
    win_seqlens = []  # per-window token counts (in patch tokens)
    full_seqlens = []
    base = 0
    for t, h, w in grid_thw:
        # --- rotary pos ids (per patch, permuted so each merge-unit is contiguous)
        gh, gw = h // merge, w // merge
        hh = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hh = hh.reshape(gh, merge, gw, merge).transpose(0, 2, 1, 3).reshape(-1)
        ww = np.broadcast_to(np.arange(w)[None, :], (h, w))
        ww = ww.reshape(gh, merge, gw, merge).transpose(0, 2, 1, 3).reshape(-1)
        p = np.stack([hh, ww], axis=-1)  # [h*w, 2]
        pos_list.append(np.tile(p, (t, 1)))

        # --- window index over llm-grid cells
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        pad_h = vit_ws - gh % vit_ws
        pad_w = vit_ws - gw % vit_ws
        nwh = (gh + pad_h) // vit_ws
        nww = (gw + pad_w) // vit_ws
        padded = np.full((t, gh + pad_h, gw + pad_w), -100, dtype=np.int64)
        padded[:, :gh, :gw] = idx
        padded = padded.reshape(t, nwh, vit_ws, nww, vit_ws)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(t, nwh * nww, vit_ws, vit_ws)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        new = flat[flat != -100]
        win_index_parts.append(new + base)
        win_seqlens.extend((seqlens * unit).tolist())
        full_seqlens.extend([h * w] * t)
        base += t * gh * gw

    pos_ids = np.concatenate(pos_list, axis=0)
    window_index = np.concatenate(win_index_parts, axis=0)
    S = pos_ids.shape[0]

    # segment ids over the REORDERED patch sequence
    win_seqlens = [s for s in win_seqlens if s > 0]
    win_seg = np.repeat(np.arange(len(win_seqlens)), win_seqlens)
    full_seg_orig = np.repeat(np.arange(len(full_seqlens)), full_seqlens)

    if not use_windows:
        # qwen2 variant: no window reordering; every block attends within its
        # temporal slice (the reference's qwen2/vision_forward.py has no
        # get_window_index)
        ident_units = np.arange(S // unit, dtype=np.int64)
        return {
            "pos_ids": pos_ids.astype(np.int32),
            "window_index": ident_units.astype(np.int32),
            "patch_perm": np.arange(S, dtype=np.int32),
            "win_seg": full_seg_orig.astype(np.int32),
            "full_seg": full_seg_orig.astype(np.int32),
            "reverse": ident_units.astype(np.int32),
            "seq_len": S,
            "uniform_window": 0,
        }

    # reorder pos_ids and full_seg by window_index (acting on merge-units)
    unit_perm = window_index
    patch_perm = (unit_perm[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    pos_ids = pos_ids[patch_perm]
    full_seg = full_seg_orig[patch_perm]

    reverse = np.argsort(window_index)

    # when every window has the same token count, windowed attention can run
    # as batched block-diagonal attention (reshape, no [S, S] mask)
    uniform = int(win_seqlens[0]) if len(set(win_seqlens)) == 1 else 0

    geo = {
        "pos_ids": pos_ids.astype(np.int32),
        "window_index": window_index.astype(np.int32),
        "patch_perm": patch_perm.astype(np.int32),
        "win_seg": win_seg.astype(np.int32),
        "full_seg": full_seg.astype(np.int32),
        "reverse": reverse.astype(np.int32),
        "seq_len": S,
        "uniform_window": uniform,
    }
    if not uniform:
        # ragged windows (image edge remainders): TPU-native varlen layout =
        # gather into a [n_win, w_pad] PADDED batch + key mask (static shapes,
        # batched MXU attention) instead of flash-attn's cu_seqlens varlen
        # kernel (ref vision_forward.py:33). Memory: S*w_pad logits instead of
        # the [S, S] segment-mask form.
        n_win = len(win_seqlens)
        w_pad = -(-max(win_seqlens) // 8) * 8  # sublane-friendly
        offs = np.concatenate([[0], np.cumsum(win_seqlens)[:-1]]).astype(np.int64)
        pad_gather = np.zeros((n_win, w_pad), np.int32)
        pad_mask = np.zeros((n_win, w_pad), bool)
        back_gather = np.zeros(S, np.int32)
        for i, (o, ln) in enumerate(zip(offs, win_seqlens)):
            pad_gather[i, :ln] = o + np.arange(ln)
            pad_mask[i, :ln] = True
            back_gather[o : o + ln] = i * w_pad + np.arange(ln)
        geo["pad_gather"] = pad_gather.reshape(-1)
        geo["pad_mask"] = pad_mask
        geo["back_gather"] = back_gather
    return geo


def vision_rope_angles(
    pos_ids: np.ndarray, head_dim: int, theta: float
) -> np.ndarray:
    """[S, 2] (h, w) ids -> [S, head_dim // 2] rotary angles (h-half ++ w-half)."""
    dim = head_dim // 2  # rotary dim per token
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    ang = pos_ids[:, :, None].astype(np.float32) * inv_freq[None, None, :]
    return ang.reshape(pos_ids.shape[0], -1)  # [S, 2 * dim//2] == [S, head_dim//2]


# CLIP normalisation constants (HF Qwen2VLImageProcessor defaults)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def patchify_on_device(
    cfg: VisionConfig,
    frames_u8: jnp.ndarray,  # [T, H, W, 3] uint8 (T divisible by temporal_patch_size)
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fused on-device rescale + CLIP normalise + Qwen2VL patch flattening.
    uint8 frames are 4x cheaper to ship host->device than f32 patches; XLA
    fuses the elementwise work into the patch-embed matmul's producer."""
    T, H, W, C = frames_u8.shape
    tps, ps, m = cfg.temporal_patch_size, cfg.patch_size, cfg.spatial_merge_size
    x = frames_u8.astype(jnp.float32) / 255.0
    x = (x - CLIP_MEAN) / CLIP_STD
    x = x.transpose(0, 3, 1, 2)  # [T, C, H, W]
    gt, gh, gw = T // tps, H // ps, W // ps
    x = x.reshape(gt, tps, C, gh // m, m, ps, gw // m, m, ps)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(gt * gh * gw, C * tps * ps * ps).astype(out_dtype)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_vision_params(cfg: VisionConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    L = cfg.depth
    D = cfg.hidden_size
    I = cfg.intermediate_size
    merged = D * cfg.spatial_merge_unit
    out = cfg.out_hidden_size
    patch_in = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2

    ks = jax.random.split(key, 10)

    def norm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    if cfg.variant == "qwen2_5":
        mlp = {
            "gate_w": norm(ks[3], (L, D, I)),
            "gate_b": jnp.zeros((L, I), dtype),
            "up_w": norm(ks[4], (L, D, I)),
            "up_b": jnp.zeros((L, I), dtype),
            "down_w": norm(ks[5], (L, I, D)),
            "down_b": jnp.zeros((L, D), dtype),
        }
        norm_extra = {}
        merger_ln = {"ln_q": jnp.ones((D,), dtype)}
    else:  # qwen2: LayerNorm (bias) + fc1/quick_gelu/fc2
        mlp = {
            "fc1_w": norm(ks[3], (L, D, I)),
            "fc1_b": jnp.zeros((L, I), dtype),
            "fc2_w": norm(ks[5], (L, I, D)),
            "fc2_b": jnp.zeros((L, D), dtype),
        }
        norm_extra = {
            "norm1_b": jnp.zeros((L, D), dtype),
            "norm2_b": jnp.zeros((L, D), dtype),
        }
        merger_ln = {"ln_q": jnp.ones((D,), dtype), "ln_q_b": jnp.zeros((D,), dtype)}

    return {
        "patch_embed": norm(ks[0], (patch_in, D)),
        "blocks": {
            "norm1": jnp.ones((L, D), dtype),
            "norm2": jnp.ones((L, D), dtype),
            "qkv_w": norm(ks[1], (L, D, 3 * D)),
            "qkv_b": jnp.zeros((L, 3 * D), dtype),
            "proj_w": norm(ks[2], (L, D, D)),
            "proj_b": jnp.zeros((L, D), dtype),
            **mlp,
            **norm_extra,
        },
        "merger": {
            **merger_ln,
            "fc1_w": norm(ks[6], (merged, merged)),
            "fc1_b": jnp.zeros((merged,), dtype),
            "fc2_w": norm(ks[7], (merged, out)),
            "fc2_b": jnp.zeros((out,), dtype),
        },
    }


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return (x * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _vision_attention(q, k, v, seg_mask):
    """q,k,v: [S, H, hd]; seg_mask: [S, S] bool."""
    S, H, hd = q.shape
    scale = 1.0 / np.sqrt(hd)
    logits = jnp.einsum("thd,shd->hts", q, k, preferred_element_type=jnp.float32) * scale
    logits = jnp.where(seg_mask[None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("hts,shd->thd", probs, v)
    return out.reshape(S, H * hd)


def _windowed_attention(q, k, v, w: int):
    """Block-diagonal attention over contiguous uniform windows of `w` tokens:
    [S, H, hd] -> [S/w, w, H, hd] batched attention. ~S/w times less logit
    traffic than the masked dense form."""
    S, H, hd = q.shape
    n = S // w
    scale = 1.0 / np.sqrt(hd)
    qw = q.reshape(n, w, H, hd)
    kw = k.reshape(n, w, H, hd)
    vw = v.reshape(n, w, H, hd)
    logits = (
        jnp.einsum("nthd,nshd->nhts", qw, kw, preferred_element_type=jnp.float32)
        * scale
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhts,nshd->nthd", probs, vw)
    return out.reshape(S, H * hd)


def _padded_window_attention(q, k, v, pad_gather, pad_mask, back_gather):
    """Varlen windowed attention via a PADDED [n_win, w_pad] batch — the
    TPU-native equivalent of flash-attn's cu_seqlens varlen call (ref
    vision_forward.py:33): two gathers + static-shape batched attention with
    a key mask, instead of either a dynamic-length kernel or the [S, S]
    segment mask (whose logits are S/w_pad times larger)."""
    S, H, hd = q.shape
    n, w_pad = pad_mask.shape
    scale = 1.0 / np.sqrt(hd)
    qw = jnp.take(q, pad_gather, axis=0).reshape(n, w_pad, H, hd)
    kw = jnp.take(k, pad_gather, axis=0).reshape(n, w_pad, H, hd)
    vw = jnp.take(v, pad_gather, axis=0).reshape(n, w_pad, H, hd)
    logits = (
        jnp.einsum("nthd,nshd->nhts", qw, kw, preferred_element_type=jnp.float32)
        * scale
    )
    logits = jnp.where(pad_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhts,nshd->nthd", probs, vw).reshape(n * w_pad, H * hd)
    return jnp.take(out, back_gather, axis=0)


def vision_forward(
    cfg: VisionConfig,
    params: Params,
    pixel_patches: jnp.ndarray,  # [S, in_ch * tps * ps * ps]
    *,
    rope_angles: jnp.ndarray,  # [S, head_dim // 2] (already window-reordered)
    patch_perm: jnp.ndarray,  # [S] int32 permutation of patch tokens
    reverse_unit_perm: jnp.ndarray,  # [S // unit] int32 inverse merge-unit perm
    win_seg: jnp.ndarray,  # [S] int32
    full_seg: jnp.ndarray,  # [S] int32
    uniform_window: int = 0,  # >0: windows are uniform -> block-diagonal fast path
    pad_gather: Optional[jnp.ndarray] = None,  # [n_win*w_pad] ragged-window batch
    pad_mask: Optional[jnp.ndarray] = None,  # [n_win, w_pad] bool
    back_gather: Optional[jnp.ndarray] = None,  # [S]
) -> jnp.ndarray:
    """Encode patches -> merged vision embeddings [S // merge_unit, out_hidden].

    `pixel_patches` is in the processor's original order; all index arrays come
    from `vision_geometry` for the same grid_thw.
    """
    H = cfg.num_heads
    hd = cfg.head_dim
    unit = cfg.spatial_merge_unit

    hidden = mm(pixel_patches, params["patch_embed"])  # [S, D]
    hidden = jnp.take(hidden, patch_perm, axis=0)  # window reorder

    cos = jnp.cos(rope_angles)
    sin = jnp.sin(rope_angles)

    full_mask = full_seg[:, None] == full_seg[None, :]
    win_mask = (
        full_mask if uniform_window else win_seg[:, None] == win_seg[None, :]
    )  # placeholder when the block-diagonal fast path is active

    depth = cfg.depth
    is_full = np.zeros(depth, dtype=bool)
    for i in cfg.fullatt_block_indexes:
        is_full[i] = True
    is_full = jnp.asarray(is_full)

    is_25 = cfg.variant == "qwen2_5"

    def block(hidden, layer_in):
        lp, full_flag = layer_in
        S = hidden.shape[0]
        mask = jax.lax.cond(full_flag, lambda: full_mask, lambda: win_mask)
        if is_25:
            x = rms_norm(hidden, lp["norm1"], cfg.rms_norm_eps)
        else:
            x = layer_norm(hidden, lp["norm1"], lp["norm1_b"], cfg.rms_norm_eps)
        qkv = mm(x, lp["qkv_w"]) + lp["qkv_b"]
        q, k, v = (
            qkv.reshape(S, 3, H, hd).transpose(1, 0, 2, 3)[i] for i in range(3)
        )
        q = apply_rope(q, cos[:, None, :], sin[:, None, :])
        k = apply_rope(k, cos[:, None, :], sin[:, None, :])
        if uniform_window:
            attn = jax.lax.cond(
                full_flag,
                lambda: _vision_attention(q, k, v, full_mask),
                lambda: _windowed_attention(q, k, v, uniform_window),
            )
        elif pad_gather is not None:
            attn = jax.lax.cond(
                full_flag,
                lambda: _vision_attention(q, k, v, full_mask),
                lambda: _padded_window_attention(
                    q, k, v, pad_gather, pad_mask, back_gather
                ),
            )
        else:
            attn = _vision_attention(q, k, v, mask)
        hidden = hidden + mm(attn, lp["proj_w"]) + lp["proj_b"]
        if is_25:
            x = rms_norm(hidden, lp["norm2"], cfg.rms_norm_eps)
            g = mm(x, lp["gate_w"]) + lp["gate_b"]
            u = mm(x, lp["up_w"]) + lp["up_b"]
            mlp = mm(jax.nn.silu(g) * u, lp["down_w"]) + lp["down_b"]
        else:
            x = layer_norm(hidden, lp["norm2"], lp["norm2_b"], cfg.rms_norm_eps)
            h1 = quick_gelu(mm(x, lp["fc1_w"]) + lp["fc1_b"])
            mlp = mm(h1, lp["fc2_w"]) + lp["fc2_b"]
        return hidden + mlp, None

    hidden, _ = jax.lax.scan(block, hidden, (params["blocks"], is_full))

    # merger: norm then 2-layer MLP over merge-unit groups
    mp = params["merger"]
    if is_25:
        x = rms_norm(hidden, mp["ln_q"], cfg.rms_norm_eps)
    else:
        x = layer_norm(hidden, mp["ln_q"], mp["ln_q_b"], cfg.rms_norm_eps)
    x = x.reshape(-1, unit * cfg.hidden_size)
    x = mm(x, mp["fc1_w"]) + mp["fc1_b"]
    x = jax.nn.gelu(x, approximate=False)
    x = mm(x, mp["fc2_w"]) + mp["fc2_b"]  # [S // unit, out]

    return jnp.take(x, reverse_unit_perm, axis=0)
