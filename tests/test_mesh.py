"""Multi-device tests on the virtual 8-device CPU mesh: TP+FSDP-sharded
training step (the driver's dryrun path) and TP-sharded streaming inference
producing the same generations as single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.parallel.mesh import make_mesh, shard_params
from streaming_vlm_tpu.streaming.engine import StreamingEngine
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
GRID = (1, 4, 4)
PATCH_DIM = CFG.vision.in_channels * CFG.vision.temporal_patch_size * CFG.vision.patch_size**2


def _drive(params, n_chunks=3, cfg=CFG, mesh=None, kv_quant="none"):
    stream = StreamConfig(
        text_round=2, window_size=2, chunk_duration=1,
        text_sink=4, text_sliding_window=3, max_tokens_per_chunk=4,
        kv_capacity=1024, prefill_buckets=(64, 128, 256),
        kv_quant=kv_quant,
    )
    engine = StreamingEngine(
        cfg, params, stream, SamplingConfig(do_sample=False), dtype=jnp.float32,
        mesh=mesh,
    )
    builder = PromptBuilder(cfg.tokens, FakeTokenizer(cfg.tokens))
    _, eb = builder.measure_biases()
    rng = np.random.default_rng(3)
    patch_dim = (
        cfg.vision.in_channels
        * cfg.vision.temporal_patch_size
        * cfg.vision.patch_size**2
    )
    gens = []
    for i in range(n_chunks):
        pixels = rng.normal(size=(np.prod(GRID), patch_dim)).astype(np.float32) * 0.1
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments("hello"))
            segs.extend(builder.user_turn_segments(0, 0.0, 1.0, 4, GRID, 1.0, query="q"))
        else:
            segs.extend(builder.user_turn_segments(i, float(i), float(i + 1), 4, GRID, 1.0))
        segs.extend(builder.assistant_open_segments(i))
        g, _ = engine.process_chunk(segs, pixels, GRID)
        engine.commit_assistant(g, eb, i)
        gens.append(g.tolist())
    return gens


def test_devices_available():
    assert jax.device_count() >= 8


def test_tp_sharded_inference_matches_single_device():
    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    ref = _drive(params)

    mesh = make_mesh({"data": 2, "model": 4})
    sharded, shardings = shard_params(params, mesh)
    # the attention/mlp dims of the tiny config divide the axes where possible;
    # anything that doesn't divide falls back to replication (mesh.py)
    out = _drive(sharded)
    assert out == ref


def test_dryrun_multichip_entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)


def _7b_geometry_cfg():
    """Qwen2.5-VL-7B's sharding-relevant geometry (28 q heads / 4 kv heads /
    head_dim 128 / hidden 3584 — reference checkpoint base, inference.py:531)
    at reduced depth/vocab/mlp so the CPU mesh can run it."""
    import dataclasses

    from streaming_vlm_tpu.config import qwen25_vl_7b

    cfg = qwen25_vl_7b()
    return dataclasses.replace(
        cfg,
        tokens=CFG.tokens,  # tiny-vocab special ids for FakeTokenizer
        text=dataclasses.replace(
            cfg.text, num_hidden_layers=2, vocab_size=8192,
            intermediate_size=4736,
        ),
        vision=dataclasses.replace(
            cfg.vision, depth=2, fullatt_block_indexes=(1,), hidden_size=64,
            intermediate_size=128, num_heads=4, window_size=28,
            out_hidden_size=3584,
        ),
    )


def test_7b_sharded_streaming_matches_single_device():
    """The 7B-geometry streaming engine, TP-sharded over the 8-device mesh
    with the KV arena split across kv heads, generates exactly what the
    single-device engine does (evictions included)."""
    cfg = _7b_geometry_cfg()
    params = model.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ref = _drive(params, cfg=cfg)

    mesh = make_mesh({"data": 2, "model": 4})
    sharded, _ = shard_params(params, mesh)
    out = _drive(sharded, cfg=cfg, mesh=mesh)
    assert out == ref


def test_7b_sharded_quantized_streaming():
    """Sharding rules also apply through the int8 QTensor tree ({q,s} leaves):
    sharded-quantized == single-device-quantized generations."""
    from streaming_vlm_tpu.ops.quant import quantize_model_params

    cfg = _7b_geometry_cfg()
    params = model.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    qp = quantize_model_params(params)
    ref = _drive(qp, cfg=cfg)

    mesh = make_mesh({"data": 2, "model": 4})
    sharded, _ = shard_params(qp, mesh)
    out = _drive(sharded, cfg=cfg, mesh=mesh)
    assert out == ref


def test_7b_sharded_int8_kv_arena_streaming():
    """The int8 KV arena ({q,s} pytree, StreamConfig.kv_quant) shards over
    the same kv-head axis as the bf16 arena (parallel/mesh.py
    arena_sharding_tree — scales co-sharded so dequantization stays
    device-local): TP-sharded == single-device generations."""
    cfg = _7b_geometry_cfg()
    params = model.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ref = _drive(params, cfg=cfg, kv_quant="int8")

    mesh = make_mesh({"data": 2, "model": 4})
    sharded, _ = shard_params(params, mesh)
    out = _drive(sharded, cfg=cfg, mesh=mesh, kv_quant="int8")
    assert out == ref


def test_7b_sharded_multistream_lanes_match_sharded_solo():
    """Multi-stream lanes over a TP mesh (the v5e-8 deployment shape: N
    concurrent 7B streams sharing TP-sharded weights, stacked arena split
    over kv heads with a leading lane axis): batched rounds == solo
    TP-sharded engines bitwise, evictions included."""
    import dataclasses

    from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine

    cfg = _7b_geometry_cfg()
    params = model.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    mesh = make_mesh({"data": 2, "model": 4})
    sharded, _ = shard_params(params, mesh)
    stream = StreamConfig(
        text_round=2, window_size=2, chunk_duration=1,
        text_sink=4, text_sliding_window=3, max_tokens_per_chunk=4,
        kv_capacity=1024, prefill_buckets=(64, 128, 256),
    )
    greedy = SamplingConfig(do_sample=False)
    n_rounds, n_vis = 4, 4
    rng = np.random.default_rng(9)
    D = cfg.text.hidden_size
    ve = rng.normal(size=(n_rounds, 2, n_vis, D)).astype(np.float32) * 0.1

    def solo(b):
        eng = StreamingEngine(
            cfg, sharded, stream, greedy, dtype=jnp.float32, mesh=mesh
        )
        builder = PromptBuilder(cfg.tokens, FakeTokenizer(cfg.tokens))
        _, eb = builder.measure_biases()
        gens = []
        for i in range(n_rounds):
            segs = _lane_segs(builder, i, b)
            g, _ = eng.process_chunk(
                segs, grid_thw=GRID, vis_embeds=jnp.asarray(ve[i, b])
            )
            eng.commit_assistant(g, eb, i)
            gens.append(g.tolist())
        return gens

    def _lane_segs(builder, i, b):
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments(f"ctx {b}"))
            segs.extend(
                builder.user_turn_segments(0, 0.0, 1.0, n_vis, GRID, 1.0, query="q")
            )
        else:
            segs.extend(
                builder.user_turn_segments(i, float(i), float(i + 1), n_vis, GRID, 1.0)
            )
        segs.extend(builder.assistant_open_segments(i))
        return segs

    ref = [solo(0), solo(1)]

    ms = MultiStreamEngine(
        cfg, sharded, stream, greedy, n_streams=2, dtype=jnp.float32, mesh=mesh
    )
    # stacked arena really is head-sharded: each device holds Hkv/m heads
    shard_shape = ms.k_arena.sharding.shard_shape(ms.k_arena.shape)
    assert shard_shape[3] == cfg.text.num_key_value_heads // 4
    builders = [PromptBuilder(cfg.tokens, FakeTokenizer(cfg.tokens)) for _ in range(2)]
    _, eb = builders[0].measure_biases()
    for i in range(n_rounds):
        segs = [_lane_segs(builders[b], i, b) for b in range(2)]
        outs = ms.process_round(
            segs, vis_embeds=np.stack([ve[i, 0], ve[i, 1]]), grid_thw=GRID
        )
        for b, (gen, _) in enumerate(outs):
            assert gen.tolist() == ref[b][i], (b, i)
            ms.engines[b].commit_assistant(gen, eb, i)


def test_snapshot_migrates_across_topologies():
    """A live stream snapshotted on a single device restores onto a TP mesh
    (and back): scale-up/scale-down migration mid-flight. Continuations are
    bitwise the single-device stream's."""
    cfg = _7b_geometry_cfg()
    params = model.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    mesh = make_mesh({"data": 2, "model": 4})
    sharded, _ = shard_params(params, mesh)
    stream = StreamConfig(
        text_round=2, window_size=2, chunk_duration=1,
        text_sink=4, text_sliding_window=3, max_tokens_per_chunk=4,
        kv_capacity=1024, prefill_buckets=(64, 128, 256),
    )
    greedy = SamplingConfig(do_sample=False)

    def fresh(mesh_=None):
        eng = StreamingEngine(
            cfg, sharded if mesh_ is not None else params, stream, greedy,
            dtype=jnp.float32, mesh=mesh_,
        )
        builder = PromptBuilder(cfg.tokens, FakeTokenizer(cfg.tokens))
        _, eb = builder.measure_biases()
        return eng, builder, eb

    rng = np.random.default_rng(4)
    patch_dim = (
        cfg.vision.in_channels
        * cfg.vision.temporal_patch_size
        * cfg.vision.patch_size**2
    )
    pix = [
        rng.normal(size=(16, patch_dim)).astype(np.float32) * 0.1 for _ in range(5)
    ]

    def drive(eng, builder, eb, i0, i1):
        gens = []
        for i in range(i0, i1):
            segs = []
            if i == 0:
                segs.append(builder.system_segment())
                segs.extend(builder.previous_text_segments("ctx"))
                segs.extend(
                    builder.user_turn_segments(0, 0.0, 1.0, 4, GRID, 1.0, query="q")
                )
            else:
                segs.extend(
                    builder.user_turn_segments(i, float(i), float(i + 1), 4, GRID, 1.0)
                )
            segs.extend(builder.assistant_open_segments(i))
            g, _ = eng.process_chunk(segs, pix[i], GRID)
            eng.commit_assistant(g, eb, i)
            gens.append(g.tolist())
        return gens

    # control: single-device, uninterrupted
    e0, b0, eb = fresh(None)
    ctrl = drive(e0, b0, eb, 0, 5)

    # subject: single-device chunks 0-1, migrate UP onto the TP mesh for
    # chunks 2-3, then back DOWN to a single device for chunk 4
    e1, b1, _ = fresh(None)
    drive(e1, b1, eb, 0, 2)
    up = fresh(mesh)[0]
    up.restore(e1.snapshot())
    b_up = PromptBuilder(cfg.tokens, FakeTokenizer(cfg.tokens))
    mid = drive(up, b_up, eb, 2, 4)
    assert mid == ctrl[2:4]
    down = fresh(None)[0]
    down.restore(up.snapshot())
    b_dn = PromptBuilder(cfg.tokens, FakeTokenizer(cfg.tokens))
    assert drive(down, b_dn, eb, 4, 5) == ctrl[4:5]


def test_multislice_dcn_mesh_training_step():
    """Multi-slice layout: ('dcn','data','model') mesh — params replicate
    across slices, batch shards over (dcn, data), and one training step
    produces the same loss as the flat single-mesh run (the DCN axis is pure
    data parallelism, reference torchrun/NCCL layer)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from streaming_vlm_tpu.parallel.distributed import batch_spec, make_multislice_mesh
    from streaming_vlm_tpu.train.step import make_optimizer, make_train_step

    cfg = CFG
    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    optimizer = make_optimizer(learning_rate=1e-5)
    rng = np.random.default_rng(0)
    B, T = 4, 64
    batch_np = {
        "input_ids": rng.integers(5, 900, size=(B, T)).astype(np.int32),
        "labels": rng.integers(5, 900, size=(B, T)).astype(np.int32),
        "positions": np.broadcast_to(
            np.arange(T, dtype=np.float32), (B, 3, T)
        ).copy(),
    }

    def run(mesh):
        p, _ = shard_params(params, mesh)
        opt_state = optimizer.init(p["text"])
        bs = batch_spec(mesh)
        batch = jax.device_put(
            batch_np,
            {
                "input_ids": NamedSharding(mesh, P(*bs, None)),
                "labels": NamedSharding(mesh, P(*bs, None)),
                "positions": NamedSharding(mesh, P(*bs, None, None)),
            },
        )
        step = jax.jit(make_train_step(cfg, optimizer))
        _, _, metrics = step(p, opt_state, batch)
        return float(metrics["loss"])

    ms = make_multislice_mesh(2, 2)  # {dcn: 2, data: 2, model: 2} over 8 cpus
    assert dict(ms.shape) == {"dcn": 2, "data": 2, "model": 2}
    loss_ms = run(ms)
    loss_flat = run(make_mesh({"data": 2, "model": 4}))
    np.testing.assert_allclose(loss_ms, loss_flat, rtol=1e-5)


def test_dp_lanes_over_data_axis_match_sharded_solo():
    """DP×TP serving: 4 lanes whose LANE dim shards over the mesh 'data'
    axis while kv heads shard over 'model' (parallel/mesh.py arena_sharding
    lanes=), with weights placed by shard_params_serving (TP over 'model',
    REPLICATED over 'data' — no per-layer FSDP all-gathers on the decode
    path). Batched rounds == solo sharded engines bitwise, evictions, an
    idle round, and a reset_lane included. This is the full v5e-8 serving
    shape: data×model = lane-groups × tensor-parallel."""
    from streaming_vlm_tpu.parallel.mesh import shard_params_serving
    from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine

    cfg = _7b_geometry_cfg()
    params = model.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    mesh = make_mesh({"data": 2, "model": 4})
    sharded, _ = shard_params_serving(params, mesh)
    stream = StreamConfig(
        text_round=2, window_size=2, chunk_duration=1,
        text_sink=4, text_sliding_window=3, max_tokens_per_chunk=4,
        kv_capacity=1024, prefill_buckets=(64, 128, 256),
    )
    greedy = SamplingConfig(do_sample=False)
    B, n_rounds, n_vis = 4, 4, 4
    rng = np.random.default_rng(11)
    D = cfg.text.hidden_size
    ve = rng.normal(size=(n_rounds, B, n_vis, D)).astype(np.float32) * 0.1

    def _lane_segs(builder, i, b):
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments(f"ctx {b}"))
            segs.extend(
                builder.user_turn_segments(0, 0.0, 1.0, n_vis, GRID, 1.0, query="q")
            )
        else:
            segs.extend(
                builder.user_turn_segments(i, float(i), float(i + 1), n_vis, GRID, 1.0)
            )
        segs.extend(builder.assistant_open_segments(i))
        return segs

    def solo(b, skip_round=None):
        eng = StreamingEngine(
            cfg, sharded, stream, greedy, dtype=jnp.float32, mesh=mesh
        )
        builder = PromptBuilder(cfg.tokens, FakeTokenizer(cfg.tokens))
        _, eb = builder.measure_biases()
        gens, rnd = [], 0
        for i in range(n_rounds):
            if i == skip_round:
                gens.append(None)
                continue
            segs = _lane_segs(builder, rnd, b)
            g, _ = eng.process_chunk(
                segs, grid_thw=GRID, vis_embeds=jnp.asarray(ve[i, b])
            )
            eng.commit_assistant(g, eb, rnd)
            gens.append(g.tolist())
            rnd += 1
        return gens

    # lane 3 sits out round 2 (idle lane under DP sharding)
    ref = [solo(0), solo(1), solo(2), solo(3, skip_round=2)]

    ms = MultiStreamEngine(
        cfg, sharded, stream, greedy, n_streams=B, dtype=jnp.float32, mesh=mesh
    )
    # the stacked arena really is lane- AND head-sharded: each device holds
    # B/data lanes × Hkv/model heads
    shard_shape = ms.k_arena.sharding.shard_shape(ms.k_arena.shape)
    assert shard_shape[0] == B // 2, ms.k_arena.sharding
    assert shard_shape[3] == cfg.text.num_key_value_heads // 4
    assert ms.ids_arena.sharding.shard_shape(ms.ids_arena.shape)[0] == B // 2

    builders = [
        PromptBuilder(cfg.tokens, FakeTokenizer(cfg.tokens)) for _ in range(B)
    ]
    _, eb = builders[0].measure_biases()
    rnds = [0] * B
    for i in range(n_rounds):
        segs = []
        embs = []
        for b in range(B):
            if b == 3 and i == 2:
                segs.append(None)  # idle
                embs.append(np.zeros_like(ve[i, b]))
            else:
                segs.append(_lane_segs(builders[b], rnds[b], b))
                embs.append(ve[i, b])
        outs = ms.process_round(segs, vis_embeds=np.stack(embs), grid_thw=GRID)
        for b, out in enumerate(outs):
            if out is None:
                assert ref[b][i] is None, (b, i)
                continue
            gen, _ = out
            assert gen.tolist() == ref[b][i], (b, i)
            ms.engines[b].commit_assistant(gen, eb, rnds[b])
            rnds[b] += 1

    # reset under DP sharding keeps the committed lane shardings (no silent
    # replication / recompile of the batched step)
    ms.reset_lane(1)
    assert ms.k_arena.sharding.shard_shape(ms.k_arena.shape)[0] == B // 2
    assert ms.rngs.sharding.shard_shape(ms.rngs.shape)[0] == B // 2
