"""Reconcile the prefill-MXU story (VERDICT r4 weak #7) in ONE artifact.

Two previously-separate claims:
  * r2: the achievable int8 MXU rate on this stack is ~154 TOP/s — 39% of
    the 394 TOP/s nominal int8 peak, 1.4x bf16 — and XLA + pallas agree
    (tools/profile_s8_mxu.py), i.e. the nominal 2x int8 rate is not
    reachable from this stack.
  * r4: prefill dense runs at "~39-50% MXU, cause unidentified"
    (PROFILE_7B_B8_r04.json) — a percentage computed against the NOMINAL
    int8 peak.

This script measures, same process, same day:
  1. the raw s8xs8->s32 ceiling (4096^3 dots in-scan, XLA),
  2. the bf16 ceiling (same shape),
  3. the actual prefill dense stack (the qdot W8A8 layer matmuls of the 3B
     geometry at the bench's 640-token bucket, in-scan like the real model),
and reports each as TOP/s, as % of nominal peaks, and as % of the MEASURED
ceiling. If prefill-dense/ceiling is ~1, the "low MXU%" was a
nominal-denominator artifact and the wall is real (no code change owed);
any remaining gap is quantify-scale overhead (dynamic activation
quantization + rescale ops around each dot).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/reconcile_prefill_mxu.py
"""

import json
import time

import numpy as np

NOMINAL_BF16 = 197e12  # v5e peak, bf16
NOMINAL_INT8 = 394e12  # v5e nominal int8 (2x)


def fence(x):
    import jax
    import jax.numpy as jnp

    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[:4]))


def timed(fn, *args, reps=3):
    import jax

    f = jax.jit(fn)
    fence(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    fence(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.config import qwen25_vl_3b
    from streaming_vlm_tpu.ops.quant import mm, quantize_weight

    rng = np.random.default_rng(0)
    out = {"hardware": "v5e-1 (axon tunnel)", "nominal_bf16_tops": 197,
           "nominal_int8_tops": 394}

    # ---- 1+2: raw ceilings, 4096^3, 16 dots per dispatch (in-scan) ------
    M = N = K = 4096
    REPS = 16
    flops = 2 * M * N * K * REPS

    a8 = jnp.asarray(rng.integers(-127, 128, (REPS, M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (REPS, K, N)), jnp.int8)
    ab = a8.astype(jnp.bfloat16)
    bb = b8.astype(jnp.bfloat16)

    def scan_dot(a, b, acc_t):
        def body(c, xs):
            x, y = xs
            r = jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())), preferred_element_type=acc_t
            )
            return c + r[0, 0].astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0), (a, b))[0]

    dt8 = timed(lambda a, b: scan_dot(a, b, jnp.int32), a8, b8)
    dtb = timed(lambda a, b: scan_dot(a, b, jnp.float32), ab, bb)
    ceil8 = flops / dt8
    ceilb = flops / dtb
    out["measured_int8_ceiling_tops"] = round(ceil8 / 1e12, 1)
    out["measured_bf16_ceiling_tops"] = round(ceilb / 1e12, 1)
    out["int8_ceiling_pct_of_nominal"] = round(100 * ceil8 / NOMINAL_INT8, 1)

    # ---- 3: the real prefill dense stack (3B geometry, T=640 bucket) ----
    t = qwen25_vl_3b().text
    L, D, I = t.num_hidden_layers, t.hidden_size, t.intermediate_size
    H, Hkv, hd = t.num_attention_heads, t.num_key_value_heads, t.head_dim
    T = 640
    ws = {
        "q_w": (D, H * hd), "k_w": (D, Hkv * hd), "v_w": (D, Hkv * hd),
        "o_w": (H * hd, D), "gate_w": (D, I), "up_w": (D, I), "down_w": (I, D),
    }
    qws = {
        k: quantize_weight(
            jnp.asarray(rng.normal(size=(L,) + s) * 0.02, jnp.bfloat16)
        )
        for k, s in ws.items()
    }
    x0 = jnp.asarray(rng.normal(size=(T, D)) * 0.1, jnp.bfloat16)

    def dense_stack(x, qws):
        def layer(h, lw):
            q = mm(h, lw["q_w"])
            k = mm(h, lw["k_w"])
            v = mm(h, lw["v_w"])
            attn_in = q  # stand-in: we time the DENSE stack only
            h = h + mm(attn_in, lw["o_w"])
            g = mm(h, lw["gate_w"])
            u = mm(h, lw["up_w"])
            h = h + mm(jax.nn.silu(g) * u, lw["down_w"])
            del k, v
            return h, None
        return jax.lax.scan(layer, x, qws)[0]

    dtd = timed(dense_stack, x0, qws, reps=3)
    dense_flops = 2 * T * L * sum(int(np.prod(s)) for s in ws.values())
    achieved = dense_flops / dtd
    out["prefill_dense_ms"] = round(dtd * 1e3, 2)
    out["prefill_dense_tops"] = round(achieved / 1e12, 1)
    out["prefill_pct_of_nominal_int8"] = round(100 * achieved / NOMINAL_INT8, 1)
    out["prefill_pct_of_measured_ceiling"] = round(100 * achieved / ceil8, 1)
    out["conclusion"] = (
        "If prefill_pct_of_measured_ceiling is near 100, the r4 'low MXU%' "
        "was a nominal-denominator artifact: the dense stack runs at the "
        "stack's real int8 rate and the remaining gap to nominal is the "
        "measured platform ceiling (XLA and pallas agree, "
        "tools/profile_s8_mxu.py), not a fixable inefficiency. Any "
        "shortfall below the ceiling is the dynamic-quantization overhead "
        "(per-row absmax + rescale) around each W8A8 dot."
    )
    print(json.dumps(out, indent=1))
    with open("PREFILL_MXU_RECONCILIATION_r05.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    main()
