"""Measure the chunked linear-CE (liger-kernel equivalent, train/step.py)
against the naive full-logits CE on the real TPU: forward+grad wall time and
peak-memory behavior at SFT shapes (3B vocab 151936).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_ce.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from streaming_vlm_tpu.config import qwen25_vl_3b
from streaming_vlm_tpu.train.step import chunked_cross_entropy

cfg = qwen25_vl_3b()
D = cfg.text.hidden_size
V = cfg.text.vocab_size


def naive_ce(hidden, lm_head, targets):
    logits = jnp.dot(hidden, lm_head, preferred_element_type=jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    return lse - tgt


def fence(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:4]))


def main():
    key = jax.random.PRNGKey(0)
    lm_head = jax.random.normal(key, (D, V), jnp.bfloat16) * 0.02

    for T in (2048, 8192):
        hidden = jax.random.normal(key, (T, D), jnp.bfloat16) * 0.5
        targets = jnp.arange(T, dtype=jnp.int32) % V

        from streaming_vlm_tpu.train.step import fused_linear_ce

        mask = jnp.ones((T,), bool)

        def loss_chunked(h, w):
            return chunked_cross_entropy(h, w, targets).mean()

        def loss_naive(h, w):
            return naive_ce(h, w, targets).mean()

        def loss_fused(h, w):
            return fused_linear_ce(h, w, targets, mask) / T

        for name, fn in (
            ("chunked", loss_chunked),
            ("naive", loss_naive),
            ("fused", loss_fused),
        ):
            try:
                g = jax.jit(jax.grad(fn, argnums=(0, 1)))
                fence(g(hidden, lm_head))  # compile
                t0 = time.perf_counter()
                for _ in range(3):
                    out = g(hidden, lm_head)
                fence(out)
                dt = (time.perf_counter() - t0) / 3
                print(f"T={T:5d} {name:8s} fwd+grad {dt*1e3:8.1f} ms", flush=True)
            except Exception as e:  # naive path may OOM at T=8192 ([T,V] f32 = 5 GB x several)
                print(f"T={T:5d} {name:8s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
