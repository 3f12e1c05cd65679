"""Compiled-memory analysis of the SFT step with/without remat.

AOT-lowers (no execution, abstract inputs) the 3B train step at T=8192 and
prints XLA's memory analysis — the number VERDICT r2 next #4 asks for:
without remat every layer's [T, I] activations stay live for backward;
with remat='full' only the [T, D] inter-layer carries are saved.

Usage:
  python tools/memory_remat.py [--model 3b] [--seq 8192] [--backend cpu|tpu]
(CPU lowering is enough for the analysis — the HLO and its buffer
assignment are backend-shaped but the activation-liveness difference is the
same order on both; pass --backend tpu over the tunnel for the exact v5e
numbers.)
"""

import argparse

ap = argparse.ArgumentParser()
ap.add_argument("--model", choices=("tiny", "3b", "7b"), default="3b")
ap.add_argument("--seq", type=int, default=8192)
ap.add_argument("--backend", choices=("cpu", "tpu"), default="cpu")
args = ap.parse_args()

import jax

if args.backend == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from streaming_vlm_tpu.config import PRESETS
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.train.step import make_optimizer, make_train_step

cfg = PRESETS[args.model]()
T = args.seq
B = 1

# abstract params: text tree only (frozen vision is not part of the step)
text_shapes = jax.eval_shape(
    lambda k: model.init_params(cfg, k, dtype=jnp.bfloat16)["text"],
    jax.random.PRNGKey(0),
)
optimizer = make_optimizer()
opt_shapes = jax.eval_shape(lambda p: optimizer.init(p), text_shapes)
batch = {
    "input_ids": jax.ShapeDtypeStruct((B, T), jnp.int32),
    "labels": jax.ShapeDtypeStruct((B, T), jnp.int32),
    "positions": jax.ShapeDtypeStruct((B, 3, T), jnp.float32),
}


def analyse(remat):
    step = make_train_step(cfg, optimizer, remat=remat)

    def text_step(tp, os, b):
        p = {"text": tp, "vision": {}}
        return step(p, os, b)

    lowered = jax.jit(text_step).lower(text_shapes, opt_shapes, batch)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 2**30
    if ma is None:
        print(f"remat={remat!r}: no memory analysis available on this backend")
        return
    print(
        f"remat={remat!r}: temp={ma.temp_size_in_bytes / gb:.2f} GiB  "
        f"args={ma.argument_size_in_bytes / gb:.2f} GiB  "
        f"out={ma.output_size_in_bytes / gb:.2f} GiB  "
        f"peak_total={(ma.temp_size_in_bytes + ma.argument_size_in_bytes) / gb:.2f} GiB",
        flush=True,
    )


for mode in ("none", "full", "dots"):
    analyse(mode)
