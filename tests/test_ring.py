"""Sequence parallelism (parallel/ring.py): ring attention over a 'seq'
mesh axis. Contract: the sequence-parallel loss and grads equal the
single-device vmapped sft_loss up to online-softmax fp32 roundoff (the
ring computes the SAME softmax blockwise — the algebra of
language._gqa_attention_multi / the flash kernel). The reference has no
sequence parallelism (SURVEY.md §2c — long context is handled
algorithmically by the streaming KV policy, not by sharding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streaming_vlm_tpu.config import qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.parallel.mesh import make_mesh
from streaming_vlm_tpu.parallel.ring import sft_loss_sp, sp_language_forward
from streaming_vlm_tpu.train.step import sft_loss

CFG = qwen25_vl_tiny()

# jit the grad evals: eager jax.grad through the unrolled shard_map
# graphs dispatches op-by-op across 8 virtual devices (minutes per
# test on this 1-core box); compiled it is seconds
_jitgrad = lambda f: jax.jit(jax.grad(f))



@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def _batch(B=2, T=64, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(5, 900, size=(B, T)).astype(np.int32)
    for b in range(B):
        labels[b, : 7 + 2 * b] = -100
    return {
        "input_ids": rng.integers(5, 900, size=(B, T)).astype(np.int32),
        "labels": labels,
        "positions": np.broadcast_to(
            np.arange(T, dtype=np.float32), (B, 3, T)
        ).copy(),
    }


def test_sp_forward_matches_language_forward(params):
    """Sequence-sharded hidden states == per-example language_forward."""
    from streaming_vlm_tpu.models.qwen25_vl import language

    tcfg = CFG.text
    rng = np.random.default_rng(1)
    B, T, D = 2, 64, tcfg.hidden_size
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32) * 0.3)
    pos = jnp.asarray(
        np.broadcast_to(np.arange(T, dtype=np.float32), (B, 3, T)).copy()
    )
    mesh = make_mesh({"seq": 4})
    out = sp_language_forward(tcfg, params["text"], x, pos, mesh)
    ref = jnp.stack(
        [
            language.language_forward(tcfg, params["text"], x[b], pos[b])
            for b in range(B)
        ]
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("shards", [2, 4])
def test_sp_loss_and_grads_match_vmapped(params, shards):
    batch = _batch(B=2, T=64)
    loss_ref, count_ref = sft_loss(CFG, params, batch)
    g_ref = _jitgrad(
        lambda tp: sft_loss(CFG, {**params, "text": tp}, batch)[0]
    )(params["text"])

    mesh = make_mesh({"seq": shards})
    loss_sp, count_sp = sft_loss_sp(CFG, params, batch, mesh)
    g_sp = _jitgrad(
        lambda tp: sft_loss_sp(CFG, {**params, "text": tp}, batch, mesh)[0]
    )(params["text"])

    assert int(count_sp) == int(count_ref)
    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=2e-5)
    flat_sp = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_sp)
    )
    for p, v in jax.tree_util.tree_leaves_with_path(g_ref):
        np.testing.assert_allclose(
            np.asarray(flat_sp[jax.tree_util.keystr(p)]),
            np.asarray(v),
            rtol=3e-4,
            atol=1e-5,
            err_msg=jax.tree_util.keystr(p),
        )


def test_dp_x_sp_mesh(params):
    """('data','seq') mesh: batch shards over 'data' while the sequence
    shards over 'seq' — loss still equals the single-device run."""
    batch = _batch(B=4, T=32, seed=3)
    mesh = make_mesh({"data": 2, "seq": 2})
    loss_ref, _ = sft_loss(CFG, params, batch)
    loss_sp, _ = sft_loss_sp(CFG, params, batch, mesh)
    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=2e-5)


def test_sp_remat_grads(params):
    """In-shard remat ('full') preserves gradient equality."""
    batch = _batch(B=2, T=32, seed=5)
    mesh = make_mesh({"seq": 2})
    g_ref = _jitgrad(
        lambda tp: sft_loss(CFG, {**params, "text": tp}, batch, remat="full")[0]
    )(params["text"])
    g_sp = _jitgrad(
        lambda tp: sft_loss_sp(
            CFG, {**params, "text": tp}, batch, mesh, remat="full"
        )[0]
    )(params["text"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-5
        ),
        g_ref,
        g_sp,
    )
