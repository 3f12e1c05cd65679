"""Measured single-chip training step (the BENCH_TRAIN artifact).

Runs the 3B text fwd+bwd (+ optionally the full AdamW update) at a given
sequence length on the real device and reports p50 step time + tokens/s.
Round 4 measured T=1024 as the single-chip wall (the attention backward
materialised f32 [T, T] scores); with the block-recomputed attention
(language._gqa_attention_chunked, auto-on at T >= 2048) T=8192 must fit —
VERDICT r4 next #2's acceptance artifact.

Usage:
  python tools/bench_train.py [--model 3b] [--seq 8192] [--steps 6]
      [--remat full] [--attn-q-block -1 (auto) | 0 (naive) | N]
      [--optimizer none|adamw] [--out BENCH_TRAIN_r05.json]

adamw on one chip only fits small models/seqs (3B moments alone ~7.8 GB
f32); the sharded path is tests/test_train.py::
test_fsdp_sharded_adamw_end_to_end_loss_decreases + docs/PARALLELISM.md.
"""

import argparse
import json
import time

ap = argparse.ArgumentParser()
ap.add_argument("--model", choices=("tiny", "3b", "7b"), default="3b")
ap.add_argument("--seq", type=int, default=8192)
ap.add_argument("--steps", type=int, default=6)
ap.add_argument("--remat", choices=("none", "full", "dots"), default="full")
ap.add_argument("--attn-q-block", type=int, default=-1,
                help="-1 auto (chunked at T>=2048), 0 naive, N block size")
ap.add_argument("--optimizer", choices=("none", "adamw"), default="none")
ap.add_argument("--out", default=None)
args = ap.parse_args()

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp
import numpy as np

from streaming_vlm_tpu.config import PRESETS
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.train.step import make_optimizer, sft_loss

cfg = PRESETS[args.model]()
T, B = args.seq, 1
qb = None if args.attn_q_block < 0 else args.attn_q_block

print(f"[init] {args.model} T={T} remat={args.remat} attn_q_block={qb} "
      f"opt={args.optimizer} on {jax.devices()}", flush=True)

t0 = time.time()
params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
text = params["text"]
del params
print(f"[init] text params ready in {time.time() - t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
batch = {
    "input_ids": jnp.asarray(rng.integers(5, 9000, size=(B, T)), jnp.int32),
    "labels": jnp.asarray(rng.integers(5, 9000, size=(B, T)), jnp.int32),
    "positions": jnp.asarray(
        np.broadcast_to(np.arange(T, dtype=np.float32), (B, 3, T)).copy()
    ),
}

optimizer = make_optimizer(learning_rate=1e-5) if args.optimizer == "adamw" else None


def loss_fn(tp, b):
    return sft_loss(
        cfg, {"text": tp, "vision": {}}, b, remat=args.remat, attn_q_block=qb
    )[0]


if optimizer is None:

    @jax.jit
    def step(tp, b):
        loss, grads = jax.value_and_grad(loss_fn)(tp, b)
        gn = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree.leaves(grads))
        )
        return loss, gn

    state = None
else:
    import optax

    state = optimizer.init(text)

    @jax.jit
    def opt_step(tp, st, b):
        loss, grads = jax.value_and_grad(loss_fn)(tp, b)
        updates, st = optimizer.update(grads, st, tp)
        return optax.apply_updates(tp, updates), st, loss


times = []
loss_val = None
for i in range(args.steps):
    t0 = time.time()
    if optimizer is None:
        loss, gn = step(text, batch)
        # force a real device->host sync (block_until_ready is unreliable
        # over the axon tunnel — CLAUDE.md)
        loss_val = float(np.asarray(loss))
    else:
        text, state, loss = opt_step(text, state, batch)
        loss_val = float(np.asarray(loss))
    dt = time.time() - t0
    times.append(dt)
    print(f"[step {i}] {dt * 1e3:.1f} ms  loss={loss_val:.4f}", flush=True)

steady = times[1:] if len(times) > 1 else times
p50 = float(np.median(steady))
result = {
    "hardware": "v5e-1 (axon tunnel)",
    "model": f"qwen2_5_vl_{args.model} text (bf16, frozen ViT path, fused linear-CE)",
    "remat": args.remat,
    "attn_q_block": "auto(512 @ T>=2048)" if qb is None else qb,
    "optimizer": args.optimizer,
    "seq_len": T,
    "step_ms_p50": round(p50 * 1e3, 1),
    "tokens_per_sec": round(B * T / p50, 1),
    "loss_finite": bool(np.isfinite(loss_val)),
    "steps": [round(t * 1e3, 1) for t in times],
}
line = json.dumps(result, indent=1)
print(line, flush=True)
if args.out:
    with open(args.out, "w") as f:
        f.write(line + "\n")
