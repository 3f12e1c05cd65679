"""Pipeline parallelism (parallel/pipeline.py): GPipe over the scan-stacked
decoder layers via shard_map + ppermute. The contract is exactness — the
pipelined loss AND its gradients equal the single-device vmapped sft_loss
(same _layer_body on the same carries; the pipeline only moves layers onto
stages), so PP is a pure scaling mode, not an approximation. The reference
has no PP at all (SURVEY.md §2c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streaming_vlm_tpu.config import qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.parallel.mesh import make_mesh
from streaming_vlm_tpu.parallel.pipeline import (
    make_train_step_pp,
    pipeline_language_forward,
    sft_loss_pp,
)
from streaming_vlm_tpu.train.step import make_optimizer, make_train_step, sft_loss

CFG = qwen25_vl_tiny()

# jit the grad evals: eager jax.grad through the unrolled shard_map
# graphs dispatches op-by-op across 8 virtual devices (minutes per
# test on this 1-core box); compiled it is seconds
_jitgrad = lambda f: jax.jit(jax.grad(f))



@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def _batch(B=4, T=48, seed=0, with_vision=False):
    rng = np.random.default_rng(seed)
    labels = rng.integers(5, 900, size=(B, T)).astype(np.int32)
    # mask a prefix per example like assistant-only labelling does
    for b in range(B):
        labels[b, : 5 + 3 * b] = -100
    batch = {
        "input_ids": rng.integers(5, 900, size=(B, T)).astype(np.int32),
        "labels": labels,
        "positions": np.broadcast_to(
            np.arange(T, dtype=np.float32), (B, 3, T)
        ).copy(),
    }
    if with_vision:
        D = CFG.text.hidden_size
        batch["vis_embeds"] = (
            rng.normal(size=(B, 4, D)).astype(np.float32) * 0.1
        )
        batch["vis_slots"] = np.tile(
            np.arange(2, 6, dtype=np.int32), (B, 1)
        )
    return batch


def _stages(n):
    return make_mesh({"stage": n})


def test_pipeline_forward_matches_language_forward(params):
    """[M, T, D] pipelined hidden states == per-example language_forward."""
    from streaming_vlm_tpu.models.qwen25_vl import language

    tcfg = CFG.text
    rng = np.random.default_rng(1)
    M, T, D = 3, 32, tcfg.hidden_size
    x = jnp.asarray(rng.normal(size=(M, T, D)).astype(np.float32) * 0.3)
    pos = jnp.asarray(
        np.broadcast_to(np.arange(T, dtype=np.float32), (M, 3, T)).copy()
    )
    mesh = _stages(4)
    out = pipeline_language_forward(
        tcfg, params["text"]["layers"], x, pos, mesh
    )
    # pipeline output is PRE-final-norm; language_forward applies it — undo
    # by comparing against the scan without final norm
    ref = []
    for m in range(M):
        h = x[m]
        inv = jnp.asarray(
            language.make_inv_freq(tcfg.head_dim, tcfg.rope_theta)
        )
        cos, sin = language.mrope_cos_sin(pos[m], inv, tcfg.mrope_section)
        mask = jnp.tril(jnp.ones((T, T), bool))

        def body(hid, lp):
            hid, _, _, _ = language._layer_body(
                tcfg, hid, lp, q_cos=cos, q_sin=sin, self_mask=mask, context=[]
            )
            return hid, None

        h, _ = jax.lax.scan(body, h, params["text"]["layers"])
        ref.append(h)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.stack(ref)), rtol=2e-6, atol=2e-6
    )


@pytest.mark.parametrize("stages", [2, 4])
def test_pp_loss_and_grads_match_vmapped(params, stages):
    batch = _batch(B=4, T=48)
    loss_ref, count_ref = sft_loss(CFG, params, batch)
    g_ref = _jitgrad(lambda tp: sft_loss(CFG, {**params, "text": tp}, batch)[0])(
        params["text"]
    )

    mesh = _stages(stages)
    loss_pp, count_pp = sft_loss_pp(CFG, params, batch, mesh)
    g_pp = _jitgrad(
        lambda tp: sft_loss_pp(CFG, {**params, "text": tp}, batch, mesh)[0]
    )(params["text"])

    assert int(count_pp) == int(count_ref)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_pp)
    )
    for p, v in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pp[jax.tree_util.keystr(p)]),
            np.asarray(v),
            rtol=5e-5,
            atol=1e-6,
            err_msg=jax.tree_util.keystr(p),
        )


def test_pp_with_vision_scatter_and_remat(params):
    """Vision embeds scatter + in-stage remat both preserve exactness."""
    batch = _batch(B=2, T=40, seed=3, with_vision=True)
    loss_ref, _ = sft_loss(CFG, params, batch)
    mesh = _stages(2)
    loss_pp, _ = sft_loss_pp(CFG, params, batch, mesh, remat="full")
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-6)
    g_ref = _jitgrad(
        lambda tp: sft_loss(CFG, {**params, "text": tp}, batch, remat="full")[0]
    )(params["text"])
    g_pp = _jitgrad(
        lambda tp: sft_loss_pp(
            CFG, {**params, "text": tp}, batch, mesh, remat="full"
        )[0]
    )(params["text"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        g_ref,
        g_pp,
    )


def test_dp_x_pp_groups(params):
    """('data', 'stage') mesh: 2 DP groups × 2 stages over 4 devices — the
    microbatch set splits across groups, layer-grad transpose accumulates
    over 'data', loss/grads still equal the single-device run."""
    batch = _batch(B=4, T=48, seed=5)
    mesh = make_mesh({"data": 2, "stage": 2})
    loss_ref, _ = sft_loss(CFG, params, batch)
    loss_pp, _ = sft_loss_pp(CFG, params, batch, mesh)
    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-6)
    g_ref = _jitgrad(lambda tp: sft_loss(CFG, {**params, "text": tp}, batch)[0])(
        params["text"]
    )
    g_pp = _jitgrad(
        lambda tp: sft_loss_pp(CFG, {**params, "text": tp}, batch, mesh)[0]
    )(params["text"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6
        ),
        g_ref,
        g_pp,
    )


def test_train_step_pp_matches_train_step(params):
    """One full optimizer step under PP == the vmapped step (same loss,
    same updated params)."""
    batch = _batch(B=4, T=32, seed=7)
    opt = make_optimizer(learning_rate=1e-3)
    mesh = _stages(4)

    step_ref = jax.jit(make_train_step(CFG, opt))
    step_pp = jax.jit(make_train_step_pp(CFG, opt, mesh))

    p_ref, s_ref, m_ref = step_ref(params, opt.init(params["text"]), batch)
    p_pp, s_pp, m_pp = step_pp(params, opt.init(params["text"]), batch)

    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_ref["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_pp["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-5
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        p_pp["text"],
        p_ref["text"],
    )


def test_trainer_parallel_mode_integration(tmp_path):
    """TrainConfig.parallel_mode='pp'/'sp' route the Trainer's jitted step
    through the pipeline / ring losses on its mesh — one step produces the
    default (gspmd) trainer's loss exactly."""
    from streaming_vlm_tpu.train.trainer import TrainConfig, Trainer

    batch = {
        k: jnp.asarray(v)
        for k, v in _batch(B=1, T=48, seed=11).items()
    }

    def one_step(mode, mesh):
        tc = TrainConfig(
            output_dir=str(tmp_path / mode), max_steps=2, warmup_steps=1,
            grad_accum=1, remat="none", parallel_mode=mode,
        )
        tr = Trainer(
            CFG,
            model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32),
            tc,
            mesh=mesh,
        )
        _, _, m = tr._jit_step(
            tr.params["text"], tr.opt_state, tr.params["vision"], batch
        )
        return float(m["loss"])

    ref = one_step("gspmd", None)
    np.testing.assert_allclose(
        one_step("pp", make_mesh({"stage": 4})), ref, rtol=1e-6
    )
    np.testing.assert_allclose(
        one_step("sp", make_mesh({"seq": 4})), ref, rtol=2e-5
    )
