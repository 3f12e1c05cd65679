"""Token sampling: repetition penalty + temperature + categorical/greedy.

Parity target: HF's logits-processor pipeline as used by the reference
generate call (/root/reference/src/streaming_vlm/inference/inference.py:428-451
— do_sample, temperature, repetition_penalty) and the sample loop
(src/streaming_vlm/inference/generate/streaming_generate_qwen.py:95-99).
Order matches HF: repetition penalty on raw logits, then temperature,
then softmax-sample (or argmax when greedy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_repetition_penalty(
    logits: jnp.ndarray,  # [V] float32
    presence: jnp.ndarray,  # [V] bool — token appears in the current sequence
    penalty: float,
) -> jnp.ndarray:
    if penalty == 1.0:
        return logits
    penalised = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalised, logits)


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,  # [V] float32
    presence: jnp.ndarray,  # [V] bool
    *,
    temperature: float,
    repetition_penalty: float,
    do_sample: bool,
) -> jnp.ndarray:
    scores = apply_repetition_penalty(logits, presence, repetition_penalty)
    if not do_sample:
        return jnp.argmax(scores).astype(jnp.int32)
    scores = scores / max(temperature, 1e-6)
    return jax.random.categorical(rng, scores).astype(jnp.int32)
