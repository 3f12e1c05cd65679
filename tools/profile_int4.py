"""Decode matmul dtype ladder on the real TPU: bf16 / int8 W8A8 / int4.

Mimics the real decode structure: weights stacked [L, D, F], lax.scan over
layers, T=1 activations — the per-token weight sweep. Timing fence = tiny
transfer. Reports effective GB/s of weight traffic.

PYTHONPATH=.:/root/.axon_site python tools/profile_int4.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

L, D, F = 36, 2048, 11008  # gate_w-like: the MLP dominates decode bytes
bf = jnp.bfloat16
key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (L, D, F), bf) * 0.02
x1 = jax.random.normal(jax.random.PRNGKey(1), (1, D), bf) * 0.3

# int8 per-column scales
wf = w.astype(jnp.float32)
s8 = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 127.0, 1e-12)
q8 = jnp.clip(jnp.round(wf / s8), -127, 127).astype(jnp.int8)
# int4 per-column scales (same layout, values in [-7, 7])
s4 = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 7.0, 1e-12)
q4_i8 = jnp.clip(jnp.round(wf / s4), -7, 7).astype(jnp.int8)
q4 = q4_i8.astype(jnp.int4)
# packed nibbles: two D-rows per byte -> [L, D//2, F] int8
lo = (q4_i8[:, 0::2] & 0xF).astype(jnp.uint8)
hi = (q4_i8[:, 1::2] & 0xF).astype(jnp.uint8)
q4p = (lo | (hi << 4)).astype(jnp.int8)
# int4 grouped scales (group=128 along D) for accuracy later; perf same as s4

jax.block_until_ready((q8, q4, q4p))


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    np.asarray(out[0, :4])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0, :4])
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    bytes_w = {
        "bf16": L * D * F * 2,
        "int8": L * D * F,
        "int4": L * D * F // 2,
    }
    tagged = [k for k in bytes_w if k in name]
    gbs = bytes_w[tagged[0]] / best / 1e9 if tagged else 0
    print(f"{name:34s} {best*1e3:9.2f} ms  ({gbs:6.0f} GB/s weight traffic)")
    return best


def quant_act(x):
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


@jax.jit
def scan_bf16(x, w):
    def body(h, wl):
        o = jnp.dot(h, wl)
        return h + o[:, :D] * 1e-6, None
    h, _ = jax.lax.scan(body, x, w)
    return h


@jax.jit
def scan_w8a8(x, q, s):
    def body(h, xs):
        ql, sl = xs
        xq, sx = quant_act(h)
        acc = jax.lax.dot_general(xq, ql, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o = (acc.astype(jnp.float32) * (sx * sl)).astype(bf)
        return h + o[:, :D] * 1e-6, None
    h, _ = jax.lax.scan(body, x, (q, s))
    return h


@jax.jit
def scan_w4a8_native(x, q4, s):
    def body(h, xs):
        ql, sl = xs
        xq, sx = quant_act(h)
        acc = jax.lax.dot_general(xq, ql, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o = (acc.astype(jnp.float32) * (sx * sl)).astype(bf)
        return h + o[:, :D] * 1e-6, None
    h, _ = jax.lax.scan(body, x, (q4, s))
    return h


@jax.jit
def scan_w4a8_unpack(x, q4p, s):
    def body(h, xs):
        qp, sl = xs  # qp [D//2, F] int8 packed
        u = qp.astype(jnp.uint8)
        lo = (u & 0xF).astype(jnp.int8)
        hi = (u >> 4).astype(jnp.int8)
        lo = lo - jnp.where(lo > 7, 16, 0).astype(jnp.int8)
        hi = hi - jnp.where(hi > 7, 16, 0).astype(jnp.int8)
        ql = jnp.stack([lo, hi], axis=1).reshape(D, F)
        xq, sx = quant_act(h)
        acc = jax.lax.dot_general(xq, ql, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o = (acc.astype(jnp.float32) * (sx * sl)).astype(bf)
        return h + o[:, :D] * 1e-6, None
    h, _ = jax.lax.scan(body, x, (q4p, s))
    return h


@jax.jit
def scan_w4_convert_bf16(x, q4, s):
    def body(h, xs):
        ql, sl = xs
        wl = ql.astype(bf) * sl.astype(bf)
        o = jnp.dot(h, wl)
        return h + o[:, :D] * 1e-6, None
    h, _ = jax.lax.scan(body, x, (q4, s))
    return h


print(f"decode matvec ladder: [1,{D}] @ [{D},{F}] x {L} layers (scan)")
timeit("bf16", scan_bf16, x1, w)
timeit("int8 W8A8 (current)", scan_w8a8, x1, q8, s8)
try:
    timeit("int4 native s4 dot", scan_w4a8_native, x1, q4, s4)
except Exception as e:
    print(f"int4 native: FAILED {str(e)[:120]}")
try:
    timeit("int4 packed+unpack s8 dot", scan_w4a8_unpack, x1, q4p, s4)
except Exception as e:
    print(f"int4 unpack: FAILED {str(e)[:120]}")
try:
    timeit("int4 convert->bf16 dot", scan_w4_convert_bf16, x1, q4, s4)
except Exception as e:
    print(f"int4 convert: FAILED {str(e)[:120]}")

# prefill shape too (T=640): is W8A8 worth it there?
x640 = jax.random.normal(jax.random.PRNGKey(2), (640, D), bf) * 0.3
print("\nprefill T=640:")
timeit("bf16 T=640", scan_bf16, x640, w)
timeit("int8 W8A8 T=640", scan_w8a8, x640, q8, s8)
try:
    timeit("int4 native T=640", scan_w4a8_native, x640, q4, s4)
except Exception as e:
    print(f"int4 native: FAILED {str(e)[:120]}")
