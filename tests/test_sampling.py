"""Sampling parity vs HF logits processors (the reference's generate pipeline:
repetition penalty on raw logits, then temperature, then sample/argmax —
inference.py:428-451 + streaming_generate_qwen.py:95-99)."""

import numpy as np

import jax
import jax.numpy as jnp

from streaming_vlm_tpu.ops.sampling import apply_repetition_penalty, sample_token


def test_repetition_penalty_matches_hf():
    import torch
    from transformers import RepetitionPenaltyLogitsProcessor

    rng = np.random.default_rng(0)
    V = 512
    logits = rng.normal(size=(V,)).astype(np.float32)
    seq = rng.integers(0, V, size=64)

    hf = RepetitionPenaltyLogitsProcessor(penalty=1.05)
    hf_out = hf(
        torch.tensor(seq)[None], torch.tensor(logits)[None]
    )[0].numpy()

    presence = np.zeros(V, bool)
    presence[seq] = True
    ours = np.asarray(
        apply_repetition_penalty(jnp.asarray(logits), jnp.asarray(presence), 1.05)
    )
    np.testing.assert_allclose(ours, hf_out, atol=1e-6)


def test_greedy_after_penalty_matches_hf_order():
    import torch
    from transformers import (
        RepetitionPenaltyLogitsProcessor,
        TemperatureLogitsWarper,
    )

    rng = np.random.default_rng(1)
    V = 256
    for trial in range(20):
        logits = rng.normal(size=(V,)).astype(np.float32) * 3
        seq = rng.integers(0, V, size=32)
        hf_scores = RepetitionPenaltyLogitsProcessor(1.05)(
            torch.tensor(seq)[None], torch.tensor(logits)[None]
        )
        hf_scores = TemperatureLogitsWarper(0.9)(None, hf_scores)[0].numpy()
        hf_tok = int(np.argmax(hf_scores))

        presence = np.zeros(V, bool)
        presence[seq] = True
        ours = int(
            sample_token(
                jax.random.PRNGKey(0),
                jnp.asarray(logits),
                jnp.asarray(presence),
                temperature=0.9,
                repetition_penalty=1.05,
                do_sample=False,
            )
        )
        assert ours == hf_tok


def test_categorical_distribution_reasonable():
    """Sampled distribution tracks softmax probabilities (distribution-level
    check — exact per-token RNG parity across frameworks is impossible;
    SURVEY.md §7 hard part 5)."""
    logits = jnp.asarray([2.0, 1.0, 0.0, -1.0])
    presence = jnp.zeros(4, bool)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    toks = jax.vmap(
        lambda k: sample_token(
            k, logits, presence, temperature=1.0, repetition_penalty=1.0, do_sample=True
        )
    )(keys)
    counts = np.bincount(np.asarray(toks), minlength=4) / 2000
    probs = np.asarray(jax.nn.softmax(logits))
    np.testing.assert_allclose(counts, probs, atol=0.05)
