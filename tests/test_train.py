"""Data pipeline + trainer tests on the tiny model and a native test video."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import VideoConfig, qwen25_vl_tiny
from streaming_vlm_tpu.data.dataset import (
    StreamDataset,
    build_seek_index,
    data_collator,
    get_phrase_before_timestamp,
)
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer
from streaming_vlm_tpu.train.trainer import TrainConfig, Trainer, find_resume_checkpoint
from streaming_vlm_tpu.video import ingest

CFG = qwen25_vl_tiny()
TOK = CFG.tokens


@pytest.fixture(scope="module")
def annotation(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    vid = str(d / "clip.mp4")
    ingest.build_native()
    ingest.write_test_video(vid, w=84, h=56, n_frames=60, fps=10)

    text_stream = [
        [0.0, 0.4, "hello"], [0.5, 0.9, "world"], [1.0, 1.4, "this"],
        [1.5, 1.9, "is"], [2.0, 2.4, "a"], [2.5, 2.9, "test"],
        [3.0, 3.4, "of"], [3.5, 3.9, "streams"], [4.0, 4.4, "ok"],
    ]
    qa_stream = [[1.0, 2.0, " What is shown?", "A moving gradient."]]
    conv = [
        {
            "role": "user",
            "content": [
                {
                    "type": "video",
                    "video": vid,
                    "video_start": 0.0,
                    "video_end": 5.0,
                    "previous": "earlier context words",
                }
            ],
        },
        {
            "role": "assistant",
            "content": [{"type": "text", "text_stream": text_stream, "qa_stream": qa_stream}],
        },
    ]
    ann = str(d / "train.jsonl")
    with open(ann, "w") as f:
        f.write(json.dumps(conv) + "\n")
        f.write(json.dumps(conv) + "\n")
    return ann


def test_phrase_before_timestamp():
    ts = [[0.0, 0.4, "a"], [0.5, 0.9, "b"], [1.0, 1.4, "c"]]
    phrase, nxt = get_phrase_before_timestamp(ts, 1.0)
    assert phrase == " a b" and nxt == 2
    phrase, nxt = get_phrase_before_timestamp(ts, 2.0, start_from=nxt)
    assert phrase == " c" and nxt == 3


def test_dataset_example(annotation):
    ds = StreamDataset(
        [annotation],
        cfg=CFG,
        encode=FakeTokenizer(TOK),
        video=VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28),
        initial_fps_frames=2,
        streaming_fps_frames=2,
        text_sink=4,
        text_sliding_window=4,
    )
    assert len(ds) == 2
    ex = data_collator([ds[0]])
    T = len(ex.input_ids)
    assert ex.labels.shape == (T,)
    assert ex.positions.shape == (3, T)
    # labels only on assistant spans; each labeled span ends with im_end
    labeled = ex.labels != -100
    assert labeled.sum() > 0
    # vision slots point at video_pad tokens
    assert np.all(ex.input_ids[ex.vision_slots] == TOK.video_pad)
    # streaming turns: 5 s at 2 frames/turn -> 5 turns
    assert len(ex.frames) == 5
    # qa question injected into round 1 or 2 user text (contains '?')
    qmark = FakeTokenizer(TOK)("?")[0]
    assert qmark in ex.input_ids.tolist()


def test_trainer_runs_and_resumes(annotation, tmp_path):
    ds = StreamDataset(
        [annotation],
        cfg=CFG,
        encode=FakeTokenizer(TOK),
        video=VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28),
    )
    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    out = str(tmp_path / "run")
    tc = TrainConfig(
        output_dir=out,
        learning_rate=1e-3,
        warmup_steps=1,
        max_steps=3,
        grad_accum=1,
        save_steps=2,
        seq_buckets=(1024,),
        vis_buckets=(256,),
    )
    tr = Trainer(CFG, params, tc)
    tr.train(ds, resume=False)
    assert tr.step == 3

    with open(os.path.join(out, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 3
    assert all(np.isfinite(r["loss"]) for r in recs)
    assert recs[0]["labeled_tokens"] > 0

    ckpt = find_resume_checkpoint(out)
    assert ckpt and ckpt.endswith("checkpoint-2")

    # resume continues from step 2
    tr2 = Trainer(CFG, model.init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32), tc)
    tr2.train(ds, resume=True, max_steps=3)
    assert tr2.step == 3


def test_trainer_prefetch_matches_synchronous(annotation, tmp_path):
    """prefetch>0 only moves dataset decode to a worker thread: metrics and
    final params must be bitwise what the synchronous loop produces."""
    ds = StreamDataset(
        [annotation],
        cfg=CFG,
        encode=FakeTokenizer(TOK),
        video=VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28),
    )
    outs = {}
    for pf in (0, 2):
        params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        out = str(tmp_path / f"run_pf{pf}")
        tc = TrainConfig(
            output_dir=out, learning_rate=1e-3, warmup_steps=1, max_steps=3,
            grad_accum=1, save_steps=10, seq_buckets=(1024,),
            vis_buckets=(256,), prefetch=pf,
        )
        tr = Trainer(CFG, params, tc)
        final = tr.train(ds, resume=False)
        with open(os.path.join(out, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        outs[pf] = ([r["loss"] for r in recs], final)
    assert outs[0][0] == outs[2][0]
    a = jax.tree_util.tree_leaves(outs[0][1])
    b = jax.tree_util.tree_leaves(outs[2][1])
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_dataset_driven_inference_with_gt(annotation):
    from streaming_vlm_tpu.config import SamplingConfig, StreamConfig
    from streaming_vlm_tpu.data.dataset import get_ground_truth
    from streaming_vlm_tpu.serve import streaming_inference_from_dataset

    ds = StreamDataset(
        [annotation],
        cfg=CFG,
        encode=FakeTokenizer(TOK),
        video=VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28),
    )
    gts = get_ground_truth(ds, 0)
    assert len(gts) == 5 and gts[0]["start_time"] == 0.0

    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    stream = StreamConfig(
        fps=2.0, chunk_duration=1.0, window_size=2, text_round=2,
        text_sink=4, text_sliding_window=4, max_tokens_per_chunk=4,
        kv_capacity=2048, prefill_buckets=(128, 256),
    )
    responses, ground_truths = streaming_inference_from_dataset(
        cfg=CFG, params=params, tokenizer=FakeTokenizer(TOK),
        dataset=ds, index=0, stream=stream,
        sampling=SamplingConfig(do_sample=False),
        use_gt=True, dtype=jnp.float32,
    )
    assert len(responses) == 5
    assert ground_truths[1]["ground_truth"].endswith(" ...")


def test_fused_linear_ce_matches_naive_grads():
    """fused_linear_ce (liger-style one-pass loss+grads) == naive CE in value
    AND both gradients (f32 exactness)."""
    import jax
    import jax.numpy as jnp

    from streaming_vlm_tpu.train.step import fused_linear_ce

    T, D, V = 70, 24, 91
    k = jax.random.PRNGKey(3)
    h = jax.random.normal(k, (T, D), jnp.float32)
    w = jax.random.normal(k, (D, V), jnp.float32) * 0.1
    t = (jnp.arange(T, dtype=jnp.int32) * 7) % V
    m = jnp.arange(T) % 4 != 1

    def naive(h, w):
        lg = h @ w
        lse = jax.nn.logsumexp(lg, axis=-1)
        tgt = jnp.take_along_axis(lg, t[:, None], 1)[:, 0]
        return jnp.sum(jnp.where(m, lse - tgt, 0.0))

    l1, g1 = jax.value_and_grad(naive, argnums=(0, 1))(h, w)
    l2, g2 = jax.value_and_grad(
        lambda h, w: fused_linear_ce(h, w, t, m), argnums=(0, 1)
    )(h, w)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_grad_equivalence():
    """Activation checkpointing ("full"/"dots") must not change the loss or
    the gradients — only the backward's memory/recompute tradeoff (reference
    gradient_checkpointing, sft_stage_1.sh:45)."""
    from streaming_vlm_tpu.train.step import sft_loss

    params = model.init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B, T = 2, 64
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 900, size=(B, T)), jnp.int32),
        "labels": jnp.asarray(rng.integers(5, 900, size=(B, T)), jnp.int32),
        "positions": jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.float32), (B, 3, T)
        ),
    }

    def loss_of(remat):
        def f(tp):
            return sft_loss(CFG, {**params, "text": tp}, batch, remat=remat)[0]

        return jax.value_and_grad(f)(params["text"])

    l0, g0 = loss_of("none")
    for mode in ("full", "dots"):
        l1, g1 = loss_of(mode)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_step_7b_geometry_fsdp_remat():
    """A 7B-geometry (full hidden/intermediate/head dims, reduced depth +
    vocab) FSDP-sharded train step with remat="full" runs on the 8-device
    mesh (VERDICT r2 next #4: remat + sharding is what makes 7B training fit
    the reference's sequence lengths)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from streaming_vlm_tpu.config import qwen25_vl_7b
    from streaming_vlm_tpu.parallel.distributed import batch_spec
    from streaming_vlm_tpu.parallel.mesh import make_mesh, shard_params
    from streaming_vlm_tpu.train.step import make_optimizer, make_train_step

    base = qwen25_vl_7b()
    cfg = dataclasses.replace(
        base,
        tokens=CFG.tokens,  # ids within the reduced vocab
        text=dataclasses.replace(
            base.text, num_hidden_layers=2, vocab_size=2048
        ),
        vision=CFG.vision,
    )
    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh({"data": 4, "model": 2})
    p, _ = shard_params(params, mesh)
    optimizer = make_optimizer(learning_rate=1e-5)
    opt_state = optimizer.init(p["text"])
    rng = np.random.default_rng(0)
    B, T = 4, 256
    bs = batch_spec(mesh)
    batch = jax.device_put(
        {
            "input_ids": rng.integers(5, 2000, size=(B, T)).astype(np.int32),
            "labels": rng.integers(5, 2000, size=(B, T)).astype(np.int32),
            "positions": np.broadcast_to(
                np.arange(T, dtype=np.float32), (B, 3, T)
            ).copy(),
        },
        {
            "input_ids": NamedSharding(mesh, P(*bs, None)),
            "labels": NamedSharding(mesh, P(*bs, None)),
            "positions": NamedSharding(mesh, P(*bs, None, None)),
        },
    )
    step = jax.jit(make_train_step(cfg, optimizer, remat="full"))
    new_p, _, metrics = step(p, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params stay sharded through the update
    qw = new_p["text"]["layers"]["q_w"]
    assert not qw.sharding.is_fully_replicated


def test_unfrozen_vision_step_updates_vision_params():
    """make_train_step(freeze_vision=False) must actually finetune the ViT:
    vision params receive gradients and change, while the frozen default
    leaves them bitwise-untouched (the reference's recipe, train.py:77-82)."""
    import optax

    from streaming_vlm_tpu.train.step import make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    B, T = 1, 64
    n_patch = 16  # (1,4,4) grid
    pd = CFG.vision.in_channels * CFG.vision.temporal_patch_size * CFG.vision.patch_size**2
    ids = rng.integers(5, 900, size=(B, T)).astype(np.int32)
    n_vis = n_patch // CFG.vision.spatial_merge_unit
    ids[0, 4 : 4 + n_vis] = CFG.tokens.video_pad
    batch = {
        "input_ids": ids,
        "labels": np.where(rng.random((B, T)) < 0.5, ids, -100).astype(np.int32),
        "positions": np.broadcast_to(
            np.arange(T, dtype=np.float32), (B, 3, T)
        ).copy(),
        "pixel_patches": rng.normal(size=(B, n_patch, pd)).astype(np.float32) * 0.1,
        "vis_slots": np.broadcast_to(
            np.arange(4, 4 + n_vis, dtype=np.int32), (B, n_vis)
        ).copy(),
    }
    params = model.init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)

    opt = optax.sgd(1e-2)
    frozen = jax.jit(make_train_step(CFG, opt, freeze_vision=True, grid_thw=(1, 4, 4)))
    p1, _, m1 = frozen(params, opt.init(params["text"]), batch)
    unfrozen = jax.jit(
        make_train_step(CFG, opt, freeze_vision=False, grid_thw=(1, 4, 4))
    )
    p2, _, m2 = unfrozen(params, opt.init(params), batch)

    # identical loss (same forward), different update scope
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    v0 = np.asarray(params["vision"]["patch_embed"])
    assert np.array_equal(np.asarray(p1["vision"]["patch_embed"]), v0)
    assert not np.array_equal(np.asarray(p2["vision"]["patch_embed"]), v0)
    # text updated in both
    t0 = np.asarray(jax.tree.leaves(params["text"])[0])
    assert not np.array_equal(np.asarray(jax.tree.leaves(p1["text"])[0]), t0)
    assert not np.array_equal(np.asarray(jax.tree.leaves(p2["text"])[0]), t0)


def test_dataset_retry_escapes_fixed_point(annotation, tmp_path):
    """index 0 is a fixed point of the reference's index*13 % n resample —
    a broken sample 0 must fall through to a good one instead of recursing
    forever, and an all-broken dataset must raise, not hang."""
    import json as _json

    with open(annotation) as f:
        good = f.readline()
    broken = _json.loads(good)
    broken[0]["content"][0]["video"] = "/nonexistent/missing.mp4"
    mixed = str(tmp_path / "mixed.jsonl")
    with open(mixed, "w") as f:
        f.write(_json.dumps(broken) + "\n")
        f.write(good)
    vid_cfg = VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28)
    ds = StreamDataset([mixed], cfg=CFG, encode=FakeTokenizer(TOK), video=vid_cfg)
    ex = ds[0]  # resamples 0 -> (fixed point) -> 1
    assert ex.input_ids.shape[0] > 0

    allbad = str(tmp_path / "allbad.jsonl")
    with open(allbad, "w") as f:
        f.write(_json.dumps(broken) + "\n")
    ds2 = StreamDataset([allbad], cfg=CFG, encode=FakeTokenizer(TOK), video=vid_cfg)
    with pytest.raises(RuntimeError, match="every resample failed"):
        ds2[0]


def test_dataset_retry_escapes_multiplicative_cycle(annotation, tmp_path):
    """index*13 % n has short cycles besides its fixed points: at n=7,
    13 ≡ 6 (mod 7) so 1 -> 6 -> 1 loops. With samples 1 and 6 broken the
    chain must still reach a healthy sample (visited-set +1 stepping)
    instead of exhausting all attempts on two indices while five healthy
    samples exist; and an all-broken dataset must try every DISTINCT
    index exactly once before giving up."""
    import json as _json

    with open(annotation) as f:
        good = f.readline()
    broken = _json.loads(good)
    broken[0]["content"][0]["video"] = "/nonexistent/missing.mp4"
    mixed = str(tmp_path / "cycle.jsonl")
    with open(mixed, "w") as f:
        for i in range(7):
            f.write((_json.dumps(broken) + "\n") if i in (1, 6) else good)
    vid_cfg = VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28)
    ds = StreamDataset([mixed], cfg=CFG, encode=FakeTokenizer(TOK), video=vid_cfg)
    assert len(ds) == 7
    ex = ds[1]  # 1 -> 6 -> (cycle back to 1: step past) -> 2 (healthy)
    assert ex.input_ids.shape[0] > 0

    # all-broken: the chain must cover all n distinct indices, then raise
    tried = []
    orig = ds.getitem

    def failing(i):
        tried.append(i)
        raise ValueError("injected")

    ds.getitem = failing
    with pytest.raises(RuntimeError, match="every resample failed"):
        StreamDataset.__getitem__(ds, 1)
    ds.getitem = orig
    assert sorted(tried) == list(range(7)), tried


def test_chunked_attention_grad_equivalence():
    """Block-recomputed (Rabe-Staats) attention must not change the loss or
    gradients vs the naive [T, T]-logits path — only the memory/recompute
    trade (the long-sequence training enabler, VERDICT r4 next #2). Also
    composes with remat="full" (nested checkpoint)."""
    from streaming_vlm_tpu.train.step import sft_loss

    params = model.init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    B, T = 2, 64
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 900, size=(B, T)), jnp.int32),
        "labels": jnp.asarray(rng.integers(5, 900, size=(B, T)), jnp.int32),
        "positions": jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.float32), (B, 3, T)
        ),
    }

    def loss_of(attn_q_block, remat="none"):
        def f(tp):
            return sft_loss(
                CFG, {**params, "text": tp}, batch, remat=remat,
                attn_q_block=attn_q_block,
            )[0]

        return jax.value_and_grad(f)(params["text"])

    l0, g0 = loss_of(0)
    # q_block dividing T and NOT dividing it (exercises the pad path)
    for qb, remat in ((16, "none"), (24, "none"), (16, "full")):
        l1, g1 = loss_of(qb, remat)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_chunked_attention_forward_matches_naive():
    """_gqa_attention_chunked == _gqa_attention on random data + ragged
    mask (value-level check, independent of the loss plumbing)."""
    from streaming_vlm_tpu.models.qwen25_vl.language import (
        _gqa_attention, _gqa_attention_chunked,
    )

    rng = np.random.default_rng(3)
    T, S, Hkv, G, hd = 80, 96, 2, 3, 32
    q = jnp.asarray(rng.normal(size=(T, Hkv * G, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(S, Hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, Hkv, hd)), jnp.float32)
    mask = jnp.asarray(rng.random(size=(T, S)) < 0.6)
    mask = mask.at[:, 0].set(True)  # no fully-masked rows
    ref = _gqa_attention(q, k, v, mask)
    out = _gqa_attention_chunked(q, k, v, mask, q_block=32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_fsdp_sharded_adamw_end_to_end_loss_decreases():
    """Full fwd+bwd+AdamW-update loop with ZeRO-style SHARDED optimizer
    state (VERDICT r4 next #4): moments are created on their params' shards
    (shard_opt_state), stay sharded across updates, and the loss decreases
    over repeated steps on one batch — the reference's ZeRO-3 training
    contract (scripts/zero3.json:16-27) on the virtual mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from streaming_vlm_tpu.parallel.mesh import (
        make_mesh, shard_opt_state, shard_params,
    )
    from streaming_vlm_tpu.train.step import make_optimizer, make_train_step

    params = model.init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    mesh = make_mesh({"data": 2, "model": 4})
    p, shardings = shard_params(params, mesh)
    optimizer = make_optimizer(learning_rate=1e-3)
    opt_state = shard_opt_state(optimizer, p["text"], shardings["text"], mesh)

    def find_mu(state):
        if hasattr(state, "mu"):
            return state.mu
        if isinstance(state, (tuple, list)):
            for s in state:
                r = find_mu(s)
                if r is not None:
                    return r
        return None

    mu = find_mu(opt_state)
    for key in ("q_w", "gate_w", "down_w"):
        assert mu["layers"][key].sharding == p["text"]["layers"][key].sharding
        assert not mu["layers"][key].sharding.is_fully_replicated

    rng = np.random.default_rng(0)
    B, T = 4, 64
    batch = jax.device_put(
        {
            "input_ids": rng.integers(5, 900, size=(B, T)).astype(np.int32),
            "labels": rng.integers(5, 900, size=(B, T)).astype(np.int32),
            "positions": np.broadcast_to(
                np.arange(T, dtype=np.float32), (B, 3, T)
            ).copy(),
        },
        {
            "input_ids": NamedSharding(mesh, P("data", None)),
            "labels": NamedSharding(mesh, P("data", None)),
            "positions": NamedSharding(mesh, P("data", None, None)),
        },
    )
    step = jax.jit(make_train_step(CFG, optimizer), donate_argnums=(0, 1))
    losses = []
    for _ in range(4):
        p, opt_state, metrics = step(p, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    # step 1 is the lr-warmup zero step; from step 2 on the loss must fall
    assert losses[-1] < losses[1] and losses[-1] < losses[0], losses
    mu2 = find_mu(opt_state)
    assert mu2["layers"]["q_w"].sharding == p["text"]["layers"]["q_w"].sharding
