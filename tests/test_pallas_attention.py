"""Pallas streaming-prefill flash attention vs the jnp reference path
(interpret mode on CPU; the compiled kernel runs in bench on the TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.ops.attention import streaming_prefill_attention


def reference_attention(q_rot, k_arena, v_arena, acos2, asin2, k_self_rot, v_self, visible):
    """jnp two-source joint-softmax attention (mirrors language._layer_body)."""
    T, H, hd = q_rot.shape
    C, Hkv, _ = k_arena.shape
    G = H // Hkv
    scale = 1.0 / np.sqrt(hd)

    def rot(k, cos, sin):
        half = hd // 2
        r = jnp.concatenate([-k[..., half:], k[..., :half]], axis=-1)
        return k * cos[:, None, :] + r * sin[:, None, :]

    ka = rot(k_arena.astype(jnp.float32), acos2, asin2)
    qg = q_rot.reshape(T, Hkv, G, hd)
    la = jnp.einsum("tkgd,skd->kgts", qg, ka) * scale
    ls = jnp.einsum("tkgd,skd->kgts", qg, k_self_rot.astype(jnp.float32)) * scale
    mask_a = (jnp.arange(C) < visible)[None, None, None, :]
    mask_s = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])[None, None, :, :]
    la = jnp.where(mask_a, la, -1e30)
    ls = jnp.where(mask_s, ls, -1e30)
    logits = jnp.concatenate([la, ls], axis=-1)
    p = jax.nn.softmax(logits, axis=-1)
    v_all = jnp.concatenate([v_arena, v_self], axis=0)
    out = jnp.einsum("kgts,skd->tkgd", p, v_all.astype(jnp.float32))
    return out.reshape(T, H, hd)


@pytest.mark.parametrize("T,C,visible", [(128, 1024, 700), (256, 512, 0), (128, 512, 512)])
def test_prefill_attention_matches_reference(T, C, visible):
    Hkv, G, hd = 2, 4, 64
    H = Hkv * G
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(T, H, hd)), jnp.float32)
    ka = jnp.asarray(rng.normal(size=(C, Hkv, hd)), jnp.float32)
    va = jnp.asarray(rng.normal(size=(C, Hkv, hd)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(T, Hkv, hd)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(T, Hkv, hd)), jnp.float32)
    ang = rng.normal(size=(C, hd // 2)).astype(np.float32)
    acos2 = jnp.asarray(np.concatenate([np.cos(ang), np.cos(ang)], -1))
    asin2 = jnp.asarray(np.concatenate([np.sin(ang), np.sin(ang)], -1))
    vis = jnp.asarray(visible, jnp.int32)

    ref = reference_attention(q, ka, va, acos2, asin2, ks, vs, vis)
    out = streaming_prefill_attention(
        q, ka, va, acos2, asin2, ks, vs, vis, t_b=64, c_b=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    # pre-rotated mode: rotate the arena K outside, pass acos2/asin2 = None
    half = hd // 2
    r = jnp.concatenate([-ka[..., half:], ka[..., :half]], axis=-1)
    ka_rot = ka * acos2[:, None, :] + r * asin2[:, None, :]
    out_pr = streaming_prefill_attention(
        q, ka_rot, va, None, None, ks, vs, vis, t_b=64, c_b=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_pr), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_language_forward_streaming_pallas_matches_jnp():
    """Full streaming prefill with pallas (interpret) == jnp path."""
    from streaming_vlm_tpu.config import qwen25_vl_tiny
    from streaming_vlm_tpu.models.qwen25_vl import language, model

    # tiny cfg has head_dim 16 -> too small for lane tiling sanity; use a
    # 64-dim head variant
    import dataclasses

    cfg = qwen25_vl_tiny()
    tcfg = dataclasses.replace(
        cfg.text, head_dim=64, mrope_section=(8, 12, 12), num_hidden_layers=2
    )
    rng = np.random.default_rng(0)
    params = language.init_language_params(tcfg, jax.random.PRNGKey(0), jnp.float32)

    T, C = 128, 512
    embeds = jnp.asarray(rng.normal(size=(T, tcfg.hidden_size)) * 0.1, jnp.float32)
    qpos = jnp.asarray(
        np.broadcast_to(np.arange(300, 300 + T, dtype=np.float32), (3, T))
    )
    apos = jnp.asarray(np.broadcast_to(np.arange(C, dtype=np.float32), (3, C)))
    ka = jnp.asarray(rng.normal(size=(tcfg.num_hidden_layers, C, tcfg.num_key_value_heads, 64)) * 0.1, jnp.float32)
    va = jnp.asarray(rng.normal(size=(tcfg.num_hidden_layers, C, tcfg.num_key_value_heads, 64)) * 0.1, jnp.float32)
    vis = jnp.asarray(300, jnp.int32)

    h_ref, (kb_ref, kbr_ref, vb_ref) = language.language_forward_streaming(
        tcfg, {"layers": params["layers"], "final_ln": params["final_ln"]},
        embeds, qpos, arena=(ka, va), arena_positions=apos, visible_len=vis,
        use_pallas=False,
    )
    h_pal, (kb, kbr, vb) = language.language_forward_streaming(
        tcfg, {"layers": params["layers"], "final_ln": params["final_ln"]},
        embeds, qpos, arena=(ka, va), arena_positions=apos, visible_len=vis,
        use_pallas=True,
    )
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kb), np.asarray(kb_ref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kbr), np.asarray(kbr_ref), atol=1e-5, rtol=1e-5)

    # pre-rotated arena mode (what the engine uses): rotate K once outside
    from streaming_vlm_tpu.models.qwen25_vl.rope import (
        apply_rope, make_inv_freq, mrope_cos_sin,
    )

    inv_freq = jnp.asarray(make_inv_freq(tcfg.head_dim, tcfg.rope_theta))
    a_cos, a_sin = mrope_cos_sin(apos, inv_freq, tcfg.mrope_section)
    ka_rot = apply_rope(ka, a_cos[:, None, :], a_sin[:, None, :])
    for up in (False, True):
        h_pr, (kb_pr, _, _) = language.language_forward_streaming(
            tcfg, {"layers": params["layers"], "final_ln": params["final_ln"]},
            embeds, qpos, arena=(ka_rot, va), arena_rotated=True, visible_len=vis,
            use_pallas=up,
        )
        np.testing.assert_allclose(np.asarray(h_pr), np.asarray(h_ref), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("visible", [0, 300, 512])
def test_decode_attention_kernel_matches_jnp(visible):
    """Pallas decode partials + log2 merge == joint-softmax jnp decode
    (arena + delta + self token), interpret mode."""
    from streaming_vlm_tpu.models.qwen25_vl.language import (
        _decode_attention_merge,
        _gqa_attention_multi,
    )

    Hkv, G, hd = 2, 4, 64
    H = Hkv * G
    C, E = 512, 24
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, H, hd)), jnp.float32)
    ak = jnp.asarray(rng.normal(size=(C, Hkv, hd)), jnp.float32)
    av = jnp.asarray(rng.normal(size=(C, Hkv, hd)), jnp.float32)
    ek = jnp.asarray(rng.normal(size=(E, Hkv, hd)), jnp.float32)
    ev = jnp.asarray(rng.normal(size=(E, Hkv, hd)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(1, Hkv, hd)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(1, Hkv, hd)), jnp.float32)
    vis = jnp.asarray(visible, jnp.int32)
    e_vis = 7

    arena_mask = jnp.broadcast_to((jnp.arange(C) < vis)[None, :], (1, C))
    extra_mask = jnp.broadcast_to((jnp.arange(E) < e_vis)[None, :], (1, E))
    self_mask = jnp.ones((1, 1), bool)
    ref = _gqa_attention_multi(
        q, [(ak, av, arena_mask), (ek, ev, extra_mask), (ks, vs, self_mask)]
    )
    out = _decode_attention_merge(
        q, [(ek, ev, extra_mask), (ks, vs, self_mask)], ak, av, vis,
        c_b=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)

    # v2: the whole joint softmax in ONE kernel (arena + delta + self)
    from streaming_vlm_tpu.ops.attention import streaming_decode_attention_full

    ks_small = jnp.concatenate([ek, ks], axis=0)
    vs_small = jnp.concatenate([ev, vs], axis=0)
    out2 = streaming_decode_attention_full(
        q[0], ak, av, ks_small, vs_small, vis, jnp.asarray(e_vis, jnp.int32),
        e_delta=E, c_b=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out2.reshape(1, H * hd)), np.asarray(ref), atol=3e-5, rtol=1e-4
    )
