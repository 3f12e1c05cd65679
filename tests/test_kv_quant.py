"""int8 KV-arena quantization (StreamConfig.kv_quant).

The arena is the marginal HBM cost per concurrent stream (multi-stream
serving) and the binding constraint of the full-attention efficiency
ablation; int8 storage halves it. Correctness contract tested here:

  * the {"q","s"} arena pytree flows through every engine path (chunk_step,
    compaction gather, batched multi-stream) unchanged;
  * a forward over the quantized arena equals a forward over the explicitly
    dequantized arrays EXACTLY (the plumbing adds no error beyond the
    quantization itself);
  * chunk 0 generation is EXACTLY the unquantized engine's (nothing
    quantized is visible until the arena is re-read in chunk 1);
  * quantization noise on later chunks is bounded (roundtrip rel err);
  * batched int8 lanes match solo int8 engines bitwise (same invariance the
    bf16 multi-stream test asserts).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import language, model
from streaming_vlm_tpu.ops.quant import dequantize_kv, quantize_kv
from streaming_vlm_tpu.streaming.engine import StreamingEngine
from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
GRID = (1, 4, 4)
N_VID_TOK = GRID[0] * (GRID[1] // 2) * (GRID[2] // 2)


def _stream_cfg(**kw):
    d = dict(
        text_round=3, window_size=2, chunk_duration=1, text_sink=8,
        text_sliding_window=8, max_tokens_per_chunk=6, kv_capacity=1024,
        prefill_buckets=(64, 128),
    )
    d.update(kw)
    return StreamConfig(**d)


def _greedy():
    return SamplingConfig(do_sample=False, repetition_penalty=1.05)


def _chunk_segs(builder, i, query, start=0.0):
    segs = []
    if i == 0:
        segs.append(builder.system_segment())
        segs.extend(builder.previous_text_segments("prev " + query))
        segs.extend(
            builder.user_turn_segments(
                0, start, start + 1.0, N_VID_TOK, GRID, 1.0, query=query
            )
        )
    else:
        segs.extend(
            builder.user_turn_segments(
                i, start + float(i), start + float(i + 1), N_VID_TOK, GRID, 1.0
            )
        )
    segs.extend(builder.assistant_open_segments(i))
    return segs


@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(11), dtype=jnp.float32)


@pytest.fixture(scope="module")
def vis_rounds():
    rng = np.random.default_rng(5)
    D = CFG.text.hidden_size
    return rng.normal(size=(6, 2, N_VID_TOK, D)).astype(np.float32) * 0.1


def test_quantize_kv_roundtrip_bound():
    """Per-(slot, head) absmax int8 over head_dim: rel err ~ 1/(2*127)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64, 2, 32)).astype(np.float32))
    t = quantize_kv(x)
    assert t["q"].dtype == jnp.int8 and t["q"].shape == x.shape
    assert t["s"].shape == x.shape[:-1]
    back = dequantize_kv(t, jnp.float32)
    rel = float(jnp.linalg.norm(back - x) / jnp.linalg.norm(x))
    assert rel < 0.006, rel  # absmax-int8 RTN on gaussian rows
    # zero rows stay exactly zero (the init-arena case)
    z = quantize_kv(jnp.zeros((2, 8, 1, 16)))
    assert np.all(np.asarray(dequantize_kv(z)) == 0.0)


def test_forward_quant_equals_dequant_oracle(params):
    """language_forward_streaming over a quantized arena == the same call
    over the explicitly dequantized arrays: the in-scan dequant plumbing is
    exact, all quantization error lives in quantize_kv itself."""
    tcfg = CFG.text
    L, Hkv, hd = tcfg.num_hidden_layers, tcfg.num_key_value_heads, tcfg.head_dim
    C, T = 64, 8
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(L, C, Hkv, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, C, Hkv, hd)).astype(np.float32))
    qk, qv = quantize_kv(k), quantize_kv(v)
    embeds = jnp.asarray(
        rng.normal(size=(T, tcfg.hidden_size)).astype(np.float32) * 0.1
    )
    qpos = jnp.broadcast_to(
        jnp.arange(32, 32 + T, dtype=jnp.float32), (3, T)
    )
    apos = jnp.broadcast_to(jnp.arange(C, dtype=jnp.float32), (3, C))

    def fwd(arena_k, arena_v):
        h, (kb, kbr, vb) = language.language_forward_streaming(
            tcfg, params["text"], embeds, qpos,
            arena=(arena_k, arena_v), arena_positions=apos,
            visible_len=jnp.asarray(32, jnp.int32), arena_rotated=False,
        )
        return np.asarray(h), np.asarray(kb)

    h_q, kb_q = fwd(qk, qv)
    h_o, kb_o = fwd(dequantize_kv(qk, jnp.float32), dequantize_kv(qv, jnp.float32))
    np.testing.assert_allclose(h_q, h_o, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(kb_q, kb_o, rtol=2e-5, atol=2e-6)
    # and the quantization noise itself stays bounded vs the bf16 arena
    h_f, _ = fwd(k, v)
    rel = np.linalg.norm(h_q - h_f) / np.linalg.norm(h_f)
    assert rel < 0.02, rel


def _run_engine(params, vis_rounds, stream_cfg, n_rounds, b=0):
    eng = StreamingEngine(CFG, params, stream_cfg, _greedy(), dtype=jnp.float32)
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, end_bias = builder.measure_biases()
    gens = []
    for i in range(n_rounds):
        segs = _chunk_segs(builder, i, "describe the scene")
        gen, _ = eng.process_chunk(
            segs, grid_thw=GRID, vis_embeds=jnp.asarray(vis_rounds[i, b])
        )
        eng.commit_assistant(gen, end_bias, i)
        # invariant: arena slot accounting matches the table every chunk
        assert eng.cached + eng.uncached_tail == eng.table.total_len()
        gens.append(np.asarray(gen))
    return gens


def test_engine_e2e_int8_kv(params, vis_rounds):
    """Greedy streaming across eviction rounds with an int8 arena: chunk 0
    matches the bf16-arena engine EXACTLY (nothing quantized is visible
    before the arena is first re-read), later chunks stay protocol-valid."""
    n_rounds = 6  # past text_round=3 / window_size=2 -> compaction active
    g_none = _run_engine(params, vis_rounds, _stream_cfg(), n_rounds)
    g_int8 = _run_engine(
        params, vis_rounds, _stream_cfg(kv_quant="int8"), n_rounds
    )
    np.testing.assert_array_equal(g_int8[0], g_none[0])
    for g in g_int8:
        assert len(g) >= 1 and g[-1] == TOK.im_end


def test_engine_raw_mode_int8_matches_prerotate(params, vis_rounds):
    """kv_quant composes with prerotate_arena=False (the rotate-in-attention
    mode the full-attention ablation uses): same dequantized values through
    mathematically identical rotations -> same greedy stream."""
    n = 4
    g_pre = _run_engine(
        params, vis_rounds, _stream_cfg(kv_quant="int8", prerotate_arena=True), n
    )
    g_raw = _run_engine(
        params, vis_rounds, _stream_cfg(kv_quant="int8", prerotate_arena=False), n
    )
    for a, b in zip(g_pre, g_raw):
        np.testing.assert_array_equal(a, b)


def test_multistream_int8_lanes_match_solo(params, vis_rounds):
    """Batched int8 lanes == solo int8 engines bitwise (the multi-stream
    equivalence contract, now over the quantized representation — exercises
    the pytree arena through vmap, batched compaction and donation)."""
    n_rounds = 5
    scfg = _stream_cfg(kv_quant="int8")
    solo = [
        _run_engine(params, vis_rounds, scfg, n_rounds, b=b) for b in range(2)
    ]

    ms = MultiStreamEngine(CFG, params, scfg, _greedy(), n_streams=2,
                           dtype=jnp.float32)
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(2)]
    _, end_bias = builders[0].measure_biases()
    for i in range(n_rounds):
        segs = [_chunk_segs(builders[b], i, "describe the scene") for b in range(2)]
        outs = ms.process_round(
            segs, vis_embeds=np.stack([vis_rounds[i, 0], vis_rounds[i, 1]]),
            grid_thw=GRID,
        )
        for b, (gen, _) in enumerate(outs):
            np.testing.assert_array_equal(gen, solo[b][i])
            ms.engines[b].commit_assistant(gen, end_bias, i)


def test_hbm_budget_accounts_int8(params):
    """The up-front HBM guard knows int8 halves the arena: a budget that
    rejects the bf16 arena admits the int8 one (and its error message points
    at kv_quant)."""
    C = 32768  # arena large enough to dominate the tiny params
    t = CFG.text
    par = sum(
        x.size * jnp.dtype(x.dtype).itemsize
        for x in jax.tree_util.tree_leaves(params)
    )
    kv_elems = t.num_hidden_layers * C * t.num_key_value_heads * t.head_dim
    item = 4  # float32 engine dtype
    bf16_need = (2 * kv_elems * item + kv_elems * item + par) * 1.1
    int8_need = (
        2 * kv_elems * (1 + 4.0 / t.head_dim) + kv_elems * item + par
    ) * 1.1
    budget = int((bf16_need + int8_need) / 2)
    os.environ["SVT_HBM_BYTES"] = str(budget)
    try:
        with pytest.raises(ValueError, match="kv_quant"):
            StreamingEngine(
                CFG, params,
                _stream_cfg(kv_capacity=C, prerotate_arena=True),
                _greedy(), dtype=jnp.float32,
            )
        StreamingEngine(
            CFG, params,
            _stream_cfg(kv_capacity=C, prerotate_arena=True, kv_quant="int8"),
            _greedy(), dtype=jnp.float32,
        )
    finally:
        del os.environ["SVT_HBM_BYTES"]


def test_engine_rot_quant_int8_streams_protocol_valid(params, vis_rounds):
    """rot_quant="int8" (requantized per-chunk rotated K copy — the 7B B=8
    HBM lever after BENCH_AB_DECODE_INT8_r05 killed the in-kernel variant):
    greedy streaming across evictions stays protocol-valid with all arena
    invariants, on top of an int8 raw arena."""
    n_rounds = 6
    gens = _run_engine(
        params, vis_rounds,
        _stream_cfg(kv_quant="int8", rot_quant="int8"), n_rounds,
    )
    for g in gens:
        assert len(g) >= 1 and g[-1] == TOK.im_end


def test_rot_quant_forward_noise_bounded(params):
    """Forward over a REQUANTIZED rotated arena == forward over its explicit
    dequantization exactly (plumbing adds nothing), and stays within the
    expected ~single-quantization noise of the exact rotated arena."""
    from streaming_vlm_tpu.models.qwen25_vl.rope import (
        apply_rope, make_inv_freq, mrope_cos_sin,
    )

    tcfg = CFG.text
    L, Hkv, hd = tcfg.num_hidden_layers, tcfg.num_key_value_heads, tcfg.head_dim
    C, T = 64, 8
    rng = np.random.default_rng(7)
    k = jnp.asarray(rng.normal(size=(L, C, Hkv, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, C, Hkv, hd)).astype(np.float32))
    apos = jnp.broadcast_to(jnp.arange(C, dtype=jnp.float32), (3, C))
    inv_freq = jnp.asarray(make_inv_freq(hd, tcfg.rope_theta))
    a_cos, a_sin = mrope_cos_sin(apos, inv_freq, tcfg.mrope_section)
    k_rot = apply_rope(k, a_cos[:, None, :], a_sin[:, None, :])
    k_rot_q = quantize_kv(k_rot)
    embeds = jnp.asarray(rng.normal(size=(T, tcfg.hidden_size)).astype(np.float32) * 0.1)
    qpos = jnp.broadcast_to(jnp.arange(32, 32 + T, dtype=jnp.float32), (3, T))

    def fwd(arena_k):
        h, _ = language.language_forward_streaming(
            tcfg, params["text"], embeds, qpos,
            arena=(arena_k, v), arena_rotated=True,
            visible_len=jnp.asarray(32, jnp.int32),
        )
        return np.asarray(h)

    h_q = fwd(k_rot_q)
    h_deq = fwd(dequantize_kv(k_rot_q, jnp.float32))
    np.testing.assert_allclose(h_q, h_deq, rtol=2e-5, atol=2e-6)
    h_exact = fwd(k_rot)
    rel = np.linalg.norm(h_q - h_exact) / np.linalg.norm(h_exact)
    assert rel < 0.02, rel
