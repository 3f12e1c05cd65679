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


def _drive(params, n_chunks=3):
    stream = StreamConfig(
        text_round=2, window_size=2, chunk_duration=1,
        text_sink=4, text_sliding_window=3, max_tokens_per_chunk=4,
        kv_capacity=1024, prefill_buckets=(64, 128, 256),
    )
    engine = StreamingEngine(
        CFG, params, stream, SamplingConfig(do_sample=False), dtype=jnp.float32
    )
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, eb = builder.measure_biases()
    rng = np.random.default_rng(3)
    gens = []
    for i in range(n_chunks):
        pixels = rng.normal(size=(np.prod(GRID), PATCH_DIM)).astype(np.float32) * 0.1
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
