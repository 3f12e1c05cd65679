"""lm_logits (T=1) matvec microbench: why 354 GB/s when decode dense hits 665?

Variants over the [D, V] int8 lm_head (V=152064), x8 steps in-graph:
  a) current: qdot s8 x s8 ([1, D] @ [D, V])
  b) transposed weight [V, D]: logits[v] = W_t[v, :] . x — contraction over
     the CONTIGUOUS dim (classic fast-matvec layout)
  c) V-chunked batched dots ([8, D, V/8])
  d) bf16 weight (2x bytes — bandwidth control)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_logits.py [--model 3b|7b]
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
D, V = cfg.hidden_size, cfg.vocab_size
REPS = 8

key = jax.random.PRNGKey(0)
w8 = jax.random.randint(key, (D, V), -127, 127, jnp.int8)
w8_t = jax.jit(lambda w: w.T)(w8)
s = jnp.abs(jax.random.normal(key, (1, V), jnp.float32)) * 0.01
s_col = jax.jit(lambda s: s.T)(s)  # [V, 1]
wbf = jax.jit(lambda w, s: (w.astype(jnp.float32) * s).astype(jnp.bfloat16))(w8, s)
h1 = jax.random.normal(key, (1, D), jnp.bfloat16)


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[:4]))


def timed(tag, fn, *xs, nbytes, n_disp=5):
    f = jax.jit(fn)
    fence(f(*xs))
    t0 = time.perf_counter()
    for _ in range(n_disp):
        out = f(*xs)
    fence(out)
    dt = (time.perf_counter() - t0) / n_disp
    print(
        f"{tag:40s} {dt*1e3:8.2f} ms/dispatch  {dt/REPS*1e3:6.2f} ms/tok  "
        f"{nbytes*REPS/dt/1e9:6.0f} GB/s eff",
        flush=True,
    )


def quant_x(h):
    hf = h.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(hf), -1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def var_a(h1, w8, s):
    def body(carry, _):
        xq, sx = quant_x(carry)
        acc = jax.lax.dot_general(
            xq, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        lg = acc.astype(jnp.float32) * (sx * s)
        return carry + 1e-6 * lg[:, :D].astype(carry.dtype), ()

    h, _ = jax.lax.scan(body, h1, None, length=REPS)
    return h[0, :4]


def var_b(h1, w8_t, s_col):
    def body(carry, _):
        xq, sx = quant_x(carry)
        # [V, D] . [D] -> [V]
        acc = jax.lax.dot_general(
            w8_t, xq[0], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        lg = (acc.astype(jnp.float32) * (sx[0] * s_col[:, 0]))[None, :]
        return carry + 1e-6 * lg[:, :D].astype(carry.dtype), ()

    h, _ = jax.lax.scan(body, h1, None, length=REPS)
    return h[0, :4]


NCH = 8


def var_c(h1, w8, s):
    wc = w8.reshape(D, NCH, V // NCH).transpose(1, 0, 2)  # [NCH, D, V/8]

    def body(carry, _):
        xq, sx = quant_x(carry)
        acc = jax.lax.dot_general(
            jnp.broadcast_to(xq, (NCH, 1, D)),
            wc,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [NCH, 1, V/8]
        lg = acc.transpose(1, 0, 2).reshape(1, V).astype(jnp.float32) * (sx * s)
        return carry + 1e-6 * lg[:, :D].astype(carry.dtype), ()

    h, _ = jax.lax.scan(body, h1, None, length=REPS)
    return h[0, :4]


def var_d(h1, wbf):
    def body(carry, _):
        lg = jnp.dot(carry, wbf, preferred_element_type=jnp.float32)
        return carry + 1e-6 * lg[:, :D].astype(carry.dtype), ()

    h, _ = jax.lax.scan(body, h1, None, length=REPS)
    return h[0, :4]


timed("a) qdot [D, V] s8 (current)", var_a, h1, w8, s, nbytes=D * V)
timed("b) transposed [V, D] s8 matvec", var_b, h1, w8_t, s_col, nbytes=D * V)
timed("c) V-chunked batched s8 dots", var_c, h1, w8, s, nbytes=D * V)
timed("d) bf16 weight (control)", var_d, h1, wbf, nbytes=2 * D * V)
