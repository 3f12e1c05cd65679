"""Is the v5e MXU's native-int8 (2x) rate reachable from XLA on this stack?

Hypothesis from profile_pieces: prefill dense 36L measured 18.8 ms ==
~100% of the BF16 roofline (9 ms at the quoted 394 int8 TOPS would be 2x
faster) — i.e. the s8xs8->s32 dot may be running at the bf16 rate.

Measures big dots in-scan (dispatch amortized): bf16xbf16->f32,
s8xs8->s32 via XLA dot_general, and s8xs8->s32 via a minimal pallas kernel.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = N = K = 4096
REPS = 16
FLOPS = 2 * M * N * K * REPS


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[:4]))


def timed(tag, fn, *args):
    f = jax.jit(fn)
    fence(f(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag:34s} {dt / REPS * 1e3:8.3f} ms/dot  {FLOPS / dt / 1e12:7.1f} TOP/s", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    a_bf = jax.random.normal(key, (M, K), jnp.bfloat16)
    b_bf = jax.random.normal(key, (K, N), jnp.bfloat16)
    a_s8 = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
    b_s8 = jax.random.randint(key, (K, N), -127, 128, jnp.int8)

    def loop_bf(a, b):
        def body(carry, _):
            o = jnp.dot(carry, b, preferred_element_type=jnp.float32)
            return (o[:, :K] * 1e-3).astype(a.dtype), ()

        out, _ = jax.lax.scan(body, a, None, length=REPS)
        return out

    timed("bf16 x bf16 -> f32 (XLA)", loop_bf, a_bf, b_bf)

    def loop_s8(a, b):
        def body(carry, _):
            o = jax.lax.dot_general(
                carry, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return jnp.clip(o[:, :K] >> 8, -127, 127).astype(jnp.int8), ()

        out, _ = jax.lax.scan(body, a, None, length=REPS)
        return out

    timed("s8 x s8 -> s32 (XLA)", loop_s8, a_s8, b_s8)

    # minimal pallas s8 matmul: single-tile-K loop, 512x512 output tiles
    TM, TN, TK = 512, 512, K

    def mm_kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def pallas_mm(a, b):
        return pl.pallas_call(
            mm_kernel,
            grid=(M // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, TK), lambda i, j: (i, 0)),
                pl.BlockSpec((TK, TN), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(a, b)

    def loop_ps8(a, b):
        def body(carry, _):
            o = pallas_mm(carry, b)
            return jnp.clip(o[:, :K] >> 8, -127, 127).astype(jnp.int8), ()

        out, _ = jax.lax.scan(body, a, None, length=REPS)
        return out

    timed("s8 x s8 -> s32 (pallas)", loop_ps8, a_s8, b_s8)


if __name__ == "__main__":
    main()
