"""Variant sweeps for the chunk_step hot pieces (see profile_pieces.py):
arena-rotate implementations, positions-from-descriptors implementations,
compaction-gather layouts, prefill-attention c_b tiles. Winners go into
product code; numbers are in-scan (dispatch amortized).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from streaming_vlm_tpu.config import qwen25_vl_3b
from streaming_vlm_tpu.models.qwen25_vl.rope import (
    apply_rope,
    make_inv_freq,
    mrope_cos_sin,
)
from streaming_vlm_tpu.ops.attention import streaming_prefill_attention

cfg = qwen25_vl_3b()
tcfg = cfg.text
L, D = tcfg.num_hidden_layers, tcfg.hidden_size
H, Hkv, hd = tcfg.num_attention_heads, tcfg.num_key_value_heads, tcfg.head_dim
C, T = 10240, 640
REPS = 8
key = jax.random.PRNGKey(0)


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:4]))


def timed(tag, fn, *args, n_disp=5, per=REPS):
    f = jax.jit(fn)
    fence(f(*args))
    t0 = time.perf_counter()
    for _ in range(n_disp):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n_disp
    print(f"{tag:44s} {dt / per * 1e3:8.2f} ms", flush=True)
    return dt / per


def main():
    k_arena = jax.random.normal(key, (L, C, Hkv, hd), jnp.bfloat16)
    v_arena = jax.random.normal(key, (L, C, Hkv, hd), jnp.bfloat16)
    inv_freq = jnp.asarray(make_inv_freq(hd, tcfg.rope_theta))
    slot_pos = jnp.broadcast_to(jnp.arange(C, dtype=jnp.float32), (3, C))
    a_cos, a_sin = jax.jit(
        lambda p: mrope_cos_sin(p, inv_freq, tcfg.mrope_section)
    )(slot_pos)

    # ---------------- arena rotate variants ----------------
    def rot_now(k, cos, sin):
        def body(carry, _):
            return apply_rope(carry, cos[:, None, :], sin[:, None, :]), ()

        out, _ = jax.lax.scan(body, k, None, length=REPS)
        return out

    timed("rotate: current (concat halves)", rot_now, k_arena, a_cos, a_sin)

    def rot_split(k, cos, sin):
        # out = [k1*c1 - k2*s1 ; k2*c2 + k1*s2]  (no negative-concat temp)
        h2 = hd // 2
        c1, s1 = cos[:, None, :], sin[:, None, :]  # [C, 1, h2] (half-dim)

        def body(carry, _):
            k1 = carry[..., :h2]
            k2 = carry[..., h2:]
            o1 = k1 * c1 - k2 * s1
            o2 = k2 * c1 + k1 * s1
            return jnp.concatenate([o1, o2], axis=-1).astype(carry.dtype), ()

        out, _ = jax.lax.scan(body, k, None, length=REPS)
        return out

    timed("rotate: split halves, concat results", rot_split, k_arena, a_cos, a_sin)

    def rot_complexish(k, cos, sin):
        # stack-free: compute into [..., 2, hd/2] then reshape
        h2 = hd // 2
        c1 = cos[:, None, :]
        s1 = sin[:, None, :]

        def body(carry, _):
            kk = carry.reshape(*carry.shape[:-1], 2, h2)
            k1 = kk[..., 0, :]
            k2 = kk[..., 1, :]
            o = jnp.stack(
                [k1 * c1 - k2 * s1, k2 * c1 + k1 * s1], axis=-2
            ).reshape(carry.shape)
            return o.astype(carry.dtype), ()

        out, _ = jax.lax.scan(body, k, None, length=REPS)
        return out

    timed("rotate: stacked [2, hd/2] layout", rot_complexish, k_arena, a_cos, a_sin)

    def rot_bf16cs(k, cos, sin):
        cosb = jnp.concatenate([cos, cos], -1).astype(jnp.bfloat16)[:, None, :]
        sinb = jnp.concatenate([sin, sin], -1).astype(jnp.bfloat16)[:, None, :]
        h2 = hd // 2

        def body(carry, _):
            rot = jnp.concatenate([-carry[..., h2:], carry[..., :h2]], axis=-1)
            return carry * cosb + rot * sinb, ()

        out, _ = jax.lax.scan(body, k, None, length=REPS)
        return out

    timed("rotate: bf16 cos/sin", rot_bf16cs, k_arena, a_cos, a_sin)

    # ---------------- positions variants ----------------
    from streaming_vlm_tpu.streaming.engine import positions_from_descriptors

    desc = {
        "starts": jnp.asarray(
            np.concatenate([np.arange(0, 64 * 160, 160), np.full(192, 2**30)]).astype(np.int32)
        ),
        "ghs": jnp.full((256,), 32, jnp.int32),
        "gws": jnp.full((256,), 64, jnp.int32),
        "kinds": jnp.ones((256,), jnp.int32),
        "tsteps": jnp.ones((256,), jnp.float32),
        "bases": jnp.zeros((256,), jnp.float32),
    }

    def pos_current(desc):
        def body(carry, _):
            p = positions_from_descriptors(desc, C)
            cos, sin = mrope_cos_sin(p, inv_freq, tcfg.mrope_section)
            return carry + cos[0, 0] + sin[0, 0], ()

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return s

    timed("positions: current (searchsorted)", pos_current, desc)

    def pos_cmp(desc):
        def pfd(desc):
            slot = jnp.arange(C, dtype=jnp.int32)
            sid = jnp.sum(desc["starts"][None, :] <= slot[:, None], axis=1) - 1
            sid = jnp.clip(sid, 0, None)
            off = slot - desc["starts"][sid]
            gh = desc["ghs"][sid]
            gw = desc["gws"][sid]
            is_vid = desc["kinds"][sid] == 1
            tstep = desc["tsteps"][sid]
            base = desc["bases"][sid]
            offf = off.astype(jnp.float32)
            t = jnp.where(is_vid, (off // (gh * gw)).astype(jnp.float32) * tstep, offf)
            h = jnp.where(is_vid, ((off // gw) % gh).astype(jnp.float32), offf)
            w = jnp.where(is_vid, (off % gw).astype(jnp.float32), offf)
            return base[None, :] + jnp.stack([t, h, w])

        def body(carry, _):
            p = pfd(desc)
            cos, sin = mrope_cos_sin(p, inv_freq, tcfg.mrope_section)
            return carry + cos[0, 0] + sin[0, 0], ()

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return s

    timed("positions: compare-sum sid", pos_cmp, desc)

    # cos/sin alone (to split the blame)
    p0 = jax.jit(lambda d: positions_from_descriptors(d, C))(desc)

    def cs_only(p0):
        def body(carry, _):
            cos, sin = mrope_cos_sin(p0 + carry, inv_freq, tcfg.mrope_section)
            return carry + cos[0, 0] + sin[0, 0], ()

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return s

    timed("positions: cos/sin only", cs_only, p0)

    # ---------------- compaction gather variants ----------------
    src = jnp.roll(jnp.arange(C, dtype=jnp.int32), 100)

    def g_take4d(k, v, src):
        def body(carry, _):
            k, v = carry
            return (jnp.take(k, src, axis=1), jnp.take(v, src, axis=1)), ()

        out, _ = jax.lax.scan(body, (k, v), None, length=REPS)
        return out

    timed("gather: current take axis=1 4D", g_take4d, k_arena, v_arena, src)

    def g_take3d(k, v, src):
        k3 = k.reshape(L, C, Hkv * hd)
        v3 = v.reshape(L, C, Hkv * hd)

        def body(carry, _):
            k, v = carry
            return (jnp.take(k, src, axis=1), jnp.take(v, src, axis=1)), ()

        out, _ = jax.lax.scan(body, (k3, v3), None, length=REPS)
        return out

    timed("gather: 3D reshape take", g_take3d, k_arena, v_arena, src)

    def g_scanlayers(k, v, src):
        def body(carry, _):
            k, v = carry

            def lay(_, kv):
                kl, vl = kv
                return _, (jnp.take(kl, src, axis=0), jnp.take(vl, src, axis=0))

            _, (k2, v2) = jax.lax.scan(lay, None, (k, v))
            return (k2, v2), ()

        out, _ = jax.lax.scan(body, (k, v), None, length=REPS)
        return out

    timed("gather: per-layer scan take", g_scanlayers, k_arena, v_arena, src)

    def g_kv_stacked(k, v, src):
        kv = jnp.stack([k, v], axis=0).reshape(2 * L, C, Hkv * hd)

        def body(carry, _):
            return jnp.take(carry, src, axis=1), ()

        out, _ = jax.lax.scan(body, kv, None, length=REPS)
        return out

    timed("gather: stacked K+V one take", g_kv_stacked, k_arena, v_arena, src)

    # ---------------- prefill attention c_b sweep ----------------
    q_rot = jax.random.normal(key, (T, H, hd), jnp.bfloat16)
    k_self = jax.random.normal(key, (T, Hkv, hd), jnp.bfloat16)
    v_self = jax.random.normal(key, (T, Hkv, hd), jnp.bfloat16)
    vis = jnp.asarray(9000, jnp.int32)

    for c_b in (512, 1024, 2048):
        for t_b in (64, 128):

            def attn36(q_rot, k_arena, v_arena, k_self, v_self, c_b=c_b, t_b=t_b):
                def body(carry, xs):
                    ak, av = xs
                    o = streaming_prefill_attention(
                        carry, ak, av, None, None, k_self, v_self, vis,
                        t_b=t_b, c_b=c_b,
                    )
                    return o.astype(carry.dtype), ()

                o, _ = jax.lax.scan(body, q_rot, (k_arena, v_arena))
                return o[0, 0, :4]

            try:
                timed(
                    f"prefill attn 36L c_b={c_b} t_b={t_b}",
                    attn36, q_rot, k_arena, v_arena, k_self, v_self, per=1,
                )
            except Exception as e:
                print(f"prefill attn c_b={c_b} t_b={t_b}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
