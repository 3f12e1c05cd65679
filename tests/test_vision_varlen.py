"""Ragged-window (varlen) vision attention: padded-batch path == segment-mask
dense path. Ragged windows arise whenever the llm grid is not divisible by the
window side — the reference handles them with flash-attn's cu_seqlens varlen
call (vision_forward.py:33); here a [n_win, w_pad] padded batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import vision


def _tiny_windowed_cfg():
    # tiny cfg has vit_ws=1 (every window one merge-unit -> always uniform);
    # bump window_size so ragged edge windows are possible
    import dataclasses

    cfg = qwen25_vl_tiny()
    return dataclasses.replace(cfg, vision=dataclasses.replace(cfg.vision, window_size=56))


def _run(cfg, params, grid, use_padded):
    v = cfg.vision
    geo = vision.vision_geometry(
        (grid,), v.window_size, v.spatial_merge_size, v.patch_size, v.use_windows
    )
    assert geo["uniform_window"] == 0, "test needs a RAGGED grid"
    assert "pad_gather" in geo
    ang = jnp.asarray(vision.vision_rope_angles(geo["pos_ids"], v.head_dim, v.rope_theta))
    S = geo["seq_len"]
    rng = np.random.default_rng(0)
    patches = jnp.asarray(
        rng.normal(size=(S, 3 * v.temporal_patch_size * v.patch_size**2)) * 0.1,
        jnp.float32,
    )
    kw = {}
    if use_padded:
        kw = dict(
            pad_gather=jnp.asarray(geo["pad_gather"]),
            pad_mask=jnp.asarray(geo["pad_mask"]),
            back_gather=jnp.asarray(geo["back_gather"]),
        )
    return vision.vision_forward(
        v,
        params,
        patches,
        rope_angles=ang,
        patch_perm=jnp.asarray(geo["patch_perm"]),
        reverse_unit_perm=jnp.asarray(geo["reverse"]),
        win_seg=jnp.asarray(geo["win_seg"]),
        full_seg=jnp.asarray(geo["full_seg"]),
        uniform_window=0,
        **kw,
    )


def test_padded_window_attention_matches_seg_mask():
    cfg = _tiny_windowed_cfg()
    v = cfg.vision
    vit_ws = v.window_size // v.spatial_merge_size // v.patch_size
    # pick a grid whose llm-grid is NOT divisible by the window side
    gh = vit_ws + 1
    grid = (1, gh * v.spatial_merge_size, (vit_ws * 2 + 1) * v.spatial_merge_size)
    params = vision.init_vision_params(v, jax.random.PRNGKey(0), jnp.float32)
    ref = _run(cfg, params, grid, use_padded=False)
    out = _run(cfg, params, grid, use_padded=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ragged_geometry_roundtrip():
    """pad_gather/back_gather are mutually inverse over real tokens."""
    cfg = _tiny_windowed_cfg()
    v = cfg.vision
    vit_ws = v.window_size // v.spatial_merge_size // v.patch_size
    grid = (2, (vit_ws + 1) * v.spatial_merge_size, (vit_ws + 2) * v.spatial_merge_size)
    geo = vision.vision_geometry(
        (grid,), v.window_size, v.spatial_merge_size, v.patch_size, True
    )
    pg = geo["pad_gather"].reshape(geo["pad_mask"].shape)
    pm = geo["pad_mask"]
    bg = geo["back_gather"]
    S = geo["seq_len"]
    flat_pos = bg  # token s sits at padded row bg[s]
    # scatter check: padded slot (i, j) holds token pg[i, j] iff pm[i, j]
    for s in range(S):
        i, j = divmod(int(flat_pos[s]), pm.shape[1])
        assert pm[i, j]
        assert int(pg[i, j]) == s
