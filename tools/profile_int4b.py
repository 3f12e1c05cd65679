"""int4/int8/bf16 decode weight-sweep, amortized: outer fori_loop x SWEEPS
inside one jit so the ~25-35 ms dispatch floor is differenced out."""
import functools, time
import jax, jax.numpy as jnp, numpy as np

L, D, F = 36, 2048, 11008
bf = jnp.bfloat16
w = jax.random.normal(jax.random.PRNGKey(0), (L, D, F), bf) * 0.02
x1 = jax.random.normal(jax.random.PRNGKey(1), (1, D), bf) * 0.3
wf = w.astype(jnp.float32)
s8 = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 127.0, 1e-12)
q8 = jnp.clip(jnp.round(wf / s8), -127, 127).astype(jnp.int8)
s4 = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True) / 7.0, 1e-12)
q4_i8 = jnp.clip(jnp.round(wf / s4), -7, 7).astype(jnp.int8)
lo = (q4_i8[:, 0::2] & 0xF).astype(jnp.uint8)
hi = (q4_i8[:, 1::2] & 0xF).astype(jnp.uint8)
q4p = (lo | (hi << 4)).astype(jnp.int8)
jax.block_until_ready((q8, q4p))

def quant_act(x):
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    return jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8), sx

def make(body, *ws):
    @functools.partial(jax.jit, static_argnames=("sweeps",))
    def run(x, sweeps):
        idx = jnp.arange(sweeps * L, dtype=jnp.int32) % L
        def inner(h, i):
            xs = jax.tree.map(lambda a: a[i], ws)
            xs = xs[0] if len(ws) == 1 else xs
            return body(h, xs), None
        h, _ = jax.lax.scan(inner, x, idx)
        return h
    return run

def body_bf16(h, wl):
    o = jnp.dot(h, wl)
    return h + o[:, :D] * 1e-6

def body_w8a8(h, xs):
    ql, sl = xs
    xq, sx = quant_act(h)
    acc = jax.lax.dot_general(xq, ql, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return h + ((acc.astype(jnp.float32) * (sx * sl)).astype(bf))[:, :D] * 1e-6

def body_w4a8(h, xs):
    qp, sl = xs
    u = qp.astype(jnp.uint8)
    lo = (u & 0xF).astype(jnp.int8); lo = lo - jnp.where(lo > 7, 16, 0).astype(jnp.int8)
    hi = (u >> 4).astype(jnp.int8);  hi = hi - jnp.where(hi > 7, 16, 0).astype(jnp.int8)
    ql = jnp.stack([lo, hi], axis=1).reshape(D, F)
    xq, sx = quant_act(h)
    acc = jax.lax.dot_general(xq, ql, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return h + ((acc.astype(jnp.float32) * (sx * sl)).astype(bf))[:, :D] * 1e-6

def body_w8_to_bf16(h, xs):
    ql, sl = xs
    wl = ql.astype(bf) * sl.astype(bf)
    return h + jnp.dot(h, wl)[:, :D] * 1e-6

runs = {
    "bf16": (make(body_bf16, w), 2 * L * D * F),
    "w8a8": (make(body_w8a8, q8, s8), L * D * F),
    "w4a8 packed": (make(body_w4a8, q4p, s4), L * D * F // 2),
    "w8->bf16 dot": (make(body_w8_to_bf16, q8, s8), L * D * F),
}
for name, (fn, bytes_per_sweep) in runs.items():
    try:
        print(f"compiling {name}", flush=True)
        for sweeps in (1, 11):
            out = fn(x1, sweeps); np.asarray(out[0, :4])
        t1 = []; t21 = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(fn(x1, 1)[0, :4]); t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(fn(x1, 11)[0, :4]); t21.append(time.perf_counter() - t0)
        per = (min(t21) - min(t1)) / 10.0
        print(f"{name:14s} {per*1e3:7.2f} ms/sweep   {bytes_per_sweep/per/1e9:6.0f} GB/s eff", flush=True)
    except Exception as e:
        print(f"{name:14s} FAILED {str(e)[:90]}")
