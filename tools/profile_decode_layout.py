"""Decode-attention arena-layout microbench (7B-geometry by default).

The piece profile shows decode attention at ~314 GB/s effective vs the
~665 GB/s the decode dense stack achieves — hypothesis: per-kv-head slices
of the [C, Hkv, hd] arena are strided (stride Hkv*hd*2 = 1 KB, 256 B reads).
Variants, each scanned over L layers x N steps inside one jit:

  a) current: k [C, Hkv, hd], einsum "tkgd,skd->kgts"
  b) head-major: k [Hkv, C, hd], einsum "kgd,ksd->kgs" (contiguous per head)
  c) block-dense: k viewed [C, Hkv*hd] x block-diagonal q -> one dense matvec
     pass (Hkv x redundant FLOPs, fully contiguous reads)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_decode_layout.py [--model 3b|7b]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from streaming_vlm_tpu.config import qwen25_vl_3b, qwen25_vl_7b

ap = argparse.ArgumentParser()
ap.add_argument("--model", choices=("3b", "7b"), default="7b")
args = ap.parse_args()
cfg = (qwen25_vl_3b() if args.model == "3b" else qwen25_vl_7b()).text

L = cfg.num_hidden_layers
H = cfg.num_attention_heads
Hkv = cfg.num_key_value_heads
hd = cfg.head_dim
G = H // Hkv
C = 10240
REPS = 8
NEG_INF = -1e30

key = jax.random.PRNGKey(0)
k_a = jax.random.normal(key, (L, C, Hkv, hd), jnp.bfloat16)
v_a = jax.random.normal(key, (L, C, Hkv, hd), jnp.bfloat16)
k_h = jax.jit(lambda x: x.transpose(0, 2, 1, 3))(k_a)  # [L, Hkv, C, hd]
v_h = jax.jit(lambda x: x.transpose(0, 2, 1, 3))(v_a)
q1 = jax.random.normal(key, (1, H, hd), jnp.bfloat16)
vis = jnp.asarray(9000, jnp.int32)
scale = 1.0 / np.sqrt(hd)


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:4]))


def timed(tag, fn, *xs, n_disp=5):
    f = jax.jit(fn)
    fence(f(*xs))
    t0 = time.perf_counter()
    for _ in range(n_disp):
        out = f(*xs)
    fence(out)
    dt = (time.perf_counter() - t0) / n_disp
    bytes_total = 2 * L * C * Hkv * hd * 2 * REPS
    print(
        f"{tag:44s} {dt*1e3:8.2f} ms/dispatch  "
        f"{dt/REPS*1e3:6.2f} ms/tok  {bytes_total/dt/1e9:6.0f} GB/s eff",
        flush=True,
    )
    return dt


mask = jnp.arange(C) < vis


def variant_a(q1, k_a, v_a):
    def step(carry, _):
        def layer(q, xs):
            ak, av = xs
            qg = q.reshape(1, Hkv, G, hd)
            lg = jnp.einsum("tkgd,skd->kgts", qg, ak, preferred_element_type=jnp.float32)
            lg = jnp.where(mask[None, None, None, :], lg * scale, NEG_INF)
            m = lg.max(-1, keepdims=True)
            e = jnp.exp(lg - m)
            s = e.sum(-1, keepdims=True)
            o = jnp.einsum("kgts,skd->tkgd", e.astype(av.dtype), av)
            o = o * (1.0 / s).astype(o.dtype).transpose(2, 0, 1, 3)
            return (q + 0.001 * o.reshape(1, H, hd)).astype(q.dtype), ()

        o, _ = jax.lax.scan(layer, carry, (k_a, v_a))
        return o, ()

    o, _ = jax.lax.scan(step, q1, None, length=REPS)
    return o[0, 0, :4]


def variant_b(q1, k_h, v_h):
    def step(carry, _):
        def layer(q, xs):
            ak, av = xs  # [Hkv, C, hd]
            qg = q.reshape(Hkv, G, hd)
            lg = jnp.einsum("kgd,ksd->kgs", qg, ak, preferred_element_type=jnp.float32)
            lg = jnp.where(mask[None, None, :], lg * scale, NEG_INF)
            m = lg.max(-1, keepdims=True)
            e = jnp.exp(lg - m)
            s = e.sum(-1, keepdims=True)
            o = jnp.einsum("kgs,ksd->kgd", e.astype(av.dtype), av)
            o = o / s.astype(o.dtype)
            return (q + 0.001 * o.reshape(1, H, hd)).astype(q.dtype), ()

        o, _ = jax.lax.scan(layer, carry, (k_h, v_h))
        return o, ()

    o, _ = jax.lax.scan(step, q1, None, length=REPS)
    return o[0, 0, :4]


def variant_c(q1, k_a, v_a):
    # block-diagonal q: [Hkv*hd, H]; logits = k2 @ qb in ONE dense pass
    def step(carry, _):
        qb = jnp.zeros((Hkv * hd, H), jnp.bfloat16)
        qg = carry.reshape(Hkv, G, hd)
        for kk in range(Hkv):
            qb = qb.at[kk * hd : (kk + 1) * hd, kk * G : (kk + 1) * G].set(
                qg[kk].T
            )

        def layer(q_qb, xs):
            q, qb = q_qb
            ak, av = xs
            k2 = ak.reshape(C, Hkv * hd)
            v2 = av.reshape(C, Hkv * hd)
            lg = jnp.dot(k2, qb, preferred_element_type=jnp.float32)  # [C, H]
            lg = jnp.where(mask[:, None], lg * scale, NEG_INF)
            m = lg.max(0, keepdims=True)
            e = jnp.exp(lg - m)
            s = e.sum(0, keepdims=True)  # [1, H]
            o_full = jnp.dot(e.T.astype(v2.dtype), v2)  # [H, Hkv*hd]
            og = o_full.reshape(Hkv, G, Hkv, hd)
            o = jnp.einsum("kgkd->kgd", og)  # select diagonal blocks
            o = o / s.reshape(Hkv, G, 1).astype(o.dtype)
            return (
                (q + 0.001 * o.reshape(1, H, hd)).astype(q.dtype),
                qb,
            ), ()

        (o, _), _ = jax.lax.scan(layer, (carry, qb), (k_a, v_a))
        return o, ()

    o, _ = jax.lax.scan(step, q1, None, length=REPS)
    return o[0, 0, :4]


timed("a) [C, Hkv, hd] einsum (current)", variant_a, q1, k_a, v_a)
timed("b) [Hkv, C, hd] head-major", variant_b, q1, k_h, v_h)
timed("c) [C, Hkv*hd] block-dense single pass", variant_c, q1, k_a, v_a)
# numeric agreement spot-check
oa = jax.jit(variant_a)(q1, k_a, v_a)
ob = jax.jit(variant_b)(q1, k_h, v_h)
oc = jax.jit(variant_c)(q1, k_a, v_a)
print("b vs a:", float(jnp.linalg.norm((ob - oa).astype(jnp.float32))))
print("c vs a:", float(jnp.linalg.norm((oc - oa).astype(jnp.float32))))
