"""Multi-stream batched serving equivalence: B streams driven through ONE
stacked-arena `chunk_step_batched` must produce EXACTLY what B independent
single-stream engines produce (greedy), across eviction rounds and
different per-stream content/chunk lengths. The capability itself is new
vs the reference (one stream per GPU — reference inference.py:72-74); the
perf claim (weight-read amortisation across streams) is measured on TPU by
`bench.py --streams N`, correctness lives here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.engine import StreamingEngine
from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
GRID = (1, 4, 4)
PATCH_DIM = (
    CFG.vision.in_channels * CFG.vision.temporal_patch_size * CFG.vision.patch_size**2
)
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


def _chunk_segs(builder, i, query, start=0.0, grid=GRID, n_vid=N_VID_TOK):
    segs = []
    if i == 0:
        segs.append(builder.system_segment())
        segs.extend(builder.previous_text_segments("prev " + query))
        segs.extend(
            builder.user_turn_segments(
                0, start, start + 1.0, n_vid, grid, 1.0, query=query
            )
        )
    else:
        segs.extend(
            builder.user_turn_segments(
                i, start + float(i), start + float(i + 1), n_vid, grid, 1.0
            )
        )
    segs.extend(builder.assistant_open_segments(i))
    return segs


@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(11), dtype=jnp.float32)


@pytest.fixture(scope="module")
def vis_embeds_rounds():
    """Per-round, per-stream vision embeddings [R, B, N_vis, D] (precomputed
    so solo and batched consume bit-identical inputs)."""
    rng = np.random.default_rng(3)
    D = CFG.text.hidden_size
    return rng.normal(size=(6, 3, N_VID_TOK, D)).astype(np.float32) * 0.1


# distinct per-stream content: different queries AND different start times
# (start 107.0 gives stream 2 longer Time=a-bs digit strings -> different
# chunk lengths within a round, exercising the shared-bucket padding)
STREAMS = [
    ("describe the scene", 0.0),
    ("commentate the match", 5.0),
    ("what is happening", 107.0),
]


def _run_solo(params, vis_embeds_rounds, n_rounds):
    all_gens = []
    for b, (query, start) in enumerate(STREAMS):
        eng = StreamingEngine(
            CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32
        )
        builder = PromptBuilder(TOK, FakeTokenizer(TOK))
        _, end_bias = builder.measure_biases()
        gens = []
        for i in range(n_rounds):
            segs = _chunk_segs(builder, i, query, start)
            gen, _ = eng.process_chunk(
                segs, grid_thw=GRID, vis_embeds=jnp.asarray(vis_embeds_rounds[i, b])
            )
            eng.commit_assistant(gen, end_bias, i)
            gens.append(np.asarray(gen))
        all_gens.append(gens)
    return all_gens


def test_batched_rounds_match_solo_engines(params, vis_embeds_rounds):
    n_rounds = 6  # past text_round=3 and window_size=2 -> evictions active
    solo = _run_solo(params, vis_embeds_rounds, n_rounds)

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=3, dtype=jnp.float32
    )
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in STREAMS]
    _, end_bias = builders[0].measure_biases()
    batched = [[] for _ in STREAMS]
    for i in range(n_rounds):
        segs = [
            _chunk_segs(builders[b], i, q, s)
            for b, (q, s) in enumerate(STREAMS)
        ]
        out = ms.process_round(
            segs, vis_embeds=jnp.asarray(vis_embeds_rounds[i]), grid_thw=GRID
        )
        gens = [g for g, _ in out]
        ms.commit_assistant(gens, end_bias, i)
        for b, g in enumerate(gens):
            batched[b].append(np.asarray(g))

    for b in range(len(STREAMS)):
        for i in range(n_rounds):
            np.testing.assert_array_equal(
                solo[b][i],
                batched[b][i],
                err_msg=f"stream {b} round {i}: batched != solo",
            )
    # per-stream invariants after the full run
    for e in ms.engines:
        assert e.cached + e.uncached_tail == e.table.total_len()


def test_batched_vision_encode_matches_solo(params):
    """encode_round (one multi-grid vision dispatch) == per-stream
    encode_video calls."""
    rng = np.random.default_rng(5)
    B, S = 3, int(np.prod(GRID))
    patches = rng.normal(size=(B, S, PATCH_DIM)).astype(np.float32) * 0.1
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=B, dtype=jnp.float32
    )
    got = np.asarray(ms.encode_round(jnp.asarray(patches), GRID))
    for b in range(B):
        want = np.asarray(
            model.encode_video(CFG, params, jnp.asarray(patches[b]), (GRID,))
        )
        np.testing.assert_allclose(got[b], want, rtol=2e-5, atol=2e-5)


def test_idle_lane_equivalence(params, vis_embeds_rounds):
    """Dynamic lanes: lane 1 idles on rounds 2 and 4 (chunk_segs None). Its
    active-round outputs must equal a solo engine fed only those chunks, and
    lane 0 (active throughout) must be completely unaffected."""
    n_rounds = 6
    active_rounds_1 = [0, 1, 3, 5]

    # solo oracles: lane 0 continuous; lane 1 only its active chunks
    solo = _run_solo(params, vis_embeds_rounds, n_rounds)  # continuous runs
    q1, s1 = STREAMS[1]
    eng1 = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
    b1 = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, end_bias = b1.measure_biases()
    solo1 = {}
    for i in active_rounds_1:
        segs = _chunk_segs(b1, i, q1, s1)
        gen, _ = eng1.process_chunk(
            segs, grid_thw=GRID, vis_embeds=jnp.asarray(vis_embeds_rounds[i, 1])
        )
        eng1.commit_assistant(gen, end_bias, i)
        solo1[i] = np.asarray(gen)

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(2)]
    for i in range(n_rounds):
        segs = [_chunk_segs(builders[0], i, *STREAMS[0])]
        if i in active_rounds_1:
            segs.append(_chunk_segs(builders[1], i, q1, s1))
        else:
            segs.append(None)
        out = ms.process_round(
            segs, vis_embeds=jnp.asarray(vis_embeds_rounds[i, :2]), grid_thw=GRID
        )
        assert (out[1] is None) == (i not in active_rounds_1)
        np.testing.assert_array_equal(
            solo[0][i], out[0][0], err_msg=f"active lane 0 diverged round {i}"
        )
        if out[1] is not None:
            np.testing.assert_array_equal(
                solo1[i], out[1][0], err_msg=f"idle-lane 1 diverged round {i}"
            )
        ms.commit_assistant(
            [out[0][0], None if out[1] is None else out[1][0]], end_bias, i
        )
    for e in ms.engines:
        assert e.cached + e.uncached_tail == e.table.total_len()


def test_reset_lane_new_client(params, vis_embeds_rounds):
    """reset_lane hands lane 0 to a NEW stream mid-flight; the new stream's
    outputs equal a fresh solo engine and lane 1 is undisturbed."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(2)]
    _, end_bias = builders[0].measure_biases()
    solo = _run_solo(params, vis_embeds_rounds, 6)

    for i in range(3):
        segs = [
            _chunk_segs(builders[b], i, *STREAMS[b]) for b in range(2)
        ]
        out = ms.process_round(
            segs, vis_embeds=jnp.asarray(vis_embeds_rounds[i, :2]), grid_thw=GRID
        )
        ms.commit_assistant([g for g, _ in out], end_bias, i)

    ms.reset_lane(0)
    nb = PromptBuilder(TOK, FakeTokenizer(TOK))
    newq, news = "summarize the events", 31.0
    eng_new = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
    nb_solo = PromptBuilder(TOK, FakeTokenizer(TOK))
    for j, i in enumerate(range(3, 6)):
        ve = jnp.asarray(vis_embeds_rounds[i, :2])
        segs = [
            _chunk_segs(nb, j, newq, news),
            _chunk_segs(builders[1], i, *STREAMS[1]),
        ]
        out = ms.process_round(segs, vis_embeds=ve, grid_thw=GRID)
        want_new, _ = eng_new.process_chunk(
            _chunk_segs(nb_solo, j, newq, news),
            grid_thw=GRID,
            vis_embeds=ve[0],
        )
        eng_new.commit_assistant(np.asarray(want_new), end_bias, j)
        np.testing.assert_array_equal(
            np.asarray(want_new), out[0][0],
            err_msg=f"new-client lane diverged at its chunk {j}",
        )
        np.testing.assert_array_equal(
            solo[1][i], out[1][0],
            err_msg=f"surviving lane disturbed after reset (round {i})",
        )
        # per-lane chunk clocks: the new client commits ITS chunk index j,
        # the surviving lane the round index i (as a real server would)
        ms.engines[0].commit_assistant(out[0][0], end_bias, j)
        ms.engines[1].commit_assistant(out[1][0], end_bias, i)


def test_multistream_prewarm_covers_round(params):
    """After prewarm, a full round triggers no new chunk_step_batched
    compilation."""
    from streaming_vlm_tpu.streaming.engine import chunk_step_batched

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    n = ms.prewarm(grids=(GRID,))
    assert n == len(_stream_cfg().prefill_buckets)
    size0 = chunk_step_batched._cache_size()
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(2)]
    _, end_bias = builders[0].measure_biases()
    rng = np.random.default_rng(0)
    D = CFG.text.hidden_size
    for i in range(2):
        segs = [
            _chunk_segs(builders[b], i, "q", 0.0) for b in range(2)
        ]
        ve = rng.normal(size=(2, N_VID_TOK, D)).astype(np.float32) * 0.1
        out = ms.process_round(segs, vis_embeds=jnp.asarray(ve), grid_thw=GRID)
        ms.commit_assistant([g for g, _ in out], end_bias, i)
    assert chunk_step_batched._cache_size() == size0


GRID_B = (1, 6, 4)  # a SECOND resolution: 6 merged vision tokens vs GRID's 4
N_VID_TOK_B = GRID_B[0] * (GRID_B[1] // 2) * (GRID_B[2] // 2)


def test_mixed_grid_round_matches_solo(params):
    """Heterogeneous clients: lanes stream at DIFFERENT resolutions in the
    SAME batched round (per-lane grids + per-lane vision-token counts padded
    to the round max). Every lane must be bitwise what a solo engine at that
    lane's own grid produces; a text-only lane and an idle lane ride along."""
    rng = np.random.default_rng(9)
    D = CFG.text.hidden_size
    grids = [GRID, GRID_B, GRID]
    nvs = [N_VID_TOK, N_VID_TOK_B, N_VID_TOK]
    n_rounds = 5
    idle_rounds_2 = {2}  # lane 2 idles one round mid-flight
    ve_rounds = [
        [rng.normal(size=(nv, D)).astype(np.float32) * 0.1 for nv in nvs]
        for _ in range(n_rounds)
    ]

    # solo oracles, each at its own grid (lane 2 skips its idle round)
    solo = []
    for b, (q, s) in enumerate(STREAMS):
        eng = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
        builder = PromptBuilder(TOK, FakeTokenizer(TOK))
        _, end_bias = builder.measure_biases()
        gens = {}
        j = 0
        for i in range(n_rounds):
            if b == 2 and i in idle_rounds_2:
                continue
            segs = _chunk_segs(builder, j, q, s, grid=grids[b], n_vid=nvs[b])
            gen, _ = eng.process_chunk(
                segs, grid_thw=grids[b], vis_embeds=jnp.asarray(ve_rounds[i][b])
            )
            eng.commit_assistant(gen, end_bias, j)
            gens[i] = np.asarray(gen)
            j += 1
        solo.append(gens)

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=3, dtype=jnp.float32
    )
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in STREAMS]
    _, end_bias = builders[0].measure_biases()
    clocks = [0, 0, 0]
    for i in range(n_rounds):
        segs, ve = [], []
        for b, (q, s) in enumerate(STREAMS):
            if b == 2 and i in idle_rounds_2:
                segs.append(None)
                ve.append(None)
            else:
                segs.append(
                    _chunk_segs(builders[b], clocks[b], q, s, grid=grids[b], n_vid=nvs[b])
                )
                ve.append(jnp.asarray(ve_rounds[i][b]))
        out = ms.process_round(segs, vis_embeds=ve, grid_thw=grids)
        for b in range(3):
            if out[b] is None:
                assert b == 2 and i in idle_rounds_2
                continue
            np.testing.assert_array_equal(
                solo[b][i], out[b][0],
                err_msg=f"mixed-grid lane {b} diverged round {i}",
            )
            ms.engines[b].commit_assistant(out[b][0], end_bias, clocks[b])
            clocks[b] += 1
    for e in ms.engines:
        assert e.cached + e.uncached_tail == e.table.total_len()


def test_encode_round_mixed_matches_solo_towers(params):
    """encode_round_mixed == per-lane encode_video at each lane's own grid;
    None lanes pass through as None."""
    rng = np.random.default_rng(12)
    grids = [GRID, None, GRID_B]
    pats = [
        None if g is None
        else rng.normal(size=(int(np.prod(g)), PATCH_DIM)).astype(np.float32) * 0.1
        for g in grids
    ]
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=3, dtype=jnp.float32
    )
    got = ms.encode_round_mixed(pats, grids)
    assert got[1] is None
    for b in (0, 2):
        want = np.asarray(
            model.encode_video(CFG, params, jnp.asarray(pats[b]), (grids[b],))
        )
        np.testing.assert_allclose(np.asarray(got[b]), want, rtol=2e-5, atol=2e-5)


def test_per_lane_decode_budgets(params, vis_embeds_rounds):
    """Per-lane max_new: lane 0 capped at 3 tokens while lane 1 keeps the
    default 6 in the SAME rounds (scan length = round max; traced n_max
    stops each lane at its own budget). Lane 0 must equal a solo engine run
    with max_new=3; lane 1 must equal the default solo run."""
    n_rounds = 4
    solo_default = _run_solo(params, vis_embeds_rounds, n_rounds)

    q0, s0 = STREAMS[0]
    eng0 = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
    b0 = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, end_bias = b0.measure_biases()
    solo_capped = []
    for i in range(n_rounds):
        segs = _chunk_segs(b0, i, q0, s0)
        gen, _ = eng0.process_chunk(
            segs, grid_thw=GRID,
            vis_embeds=jnp.asarray(vis_embeds_rounds[i, 0]), max_new=3,
        )
        eng0.commit_assistant(gen, end_bias, i)
        solo_capped.append(np.asarray(gen))

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(2)]
    for i in range(n_rounds):
        segs = [_chunk_segs(builders[b], i, *STREAMS[b]) for b in range(2)]
        out = ms.process_round(
            segs,
            vis_embeds=jnp.asarray(vis_embeds_rounds[i, :2]),
            grid_thw=GRID,
            max_new=[3, None],
        )
        # capped lane: bitwise the capped solo engine (incl. forced eos)
        np.testing.assert_array_equal(
            solo_capped[i], out[0][0],
            err_msg=f"capped lane diverged round {i}",
        )
        assert len(out[0][0]) <= 3 + 1  # budget + forced/natural eos
        # uncapped lane: bitwise the default solo run
        np.testing.assert_array_equal(
            solo_default[1][i], out[1][0],
            err_msg=f"uncapped lane diverged round {i}",
        )
        ms.engines[0].commit_assistant(out[0][0], end_bias, i)
        ms.engines[1].commit_assistant(out[1][0], end_bias, i)
    for e in ms.engines:
        assert e.cached + e.uncached_tail == e.table.total_len()


def test_steady_round_has_no_eager_device_ops(params, vis_embeds_rounds):
    """Dispatch-latency regression guard: a steady-state batched round must
    perform ZERO eager primitive dispatches on the host path — every device
    op rides a jitted executable (chunk_step_batched / compact_arena_batched)
    and host arrays ship as plain device_puts.

    Why it matters: each eager op is a per-round dispatch round-trip on a
    remote-device link, and its FIRST use is a tiny-op compile that lands
    mid-stream (measured 2026-08-19 on the axon tunnel: per-lane gen[b]
    handle slices + a shape-read np.asarray copy made round 0 2.9x the
    steady p50 and added ~220 ms to EVERY round at B=4 — see
    docs/MULTISTREAM.md). jit calls and device_puts do not go through
    jax._src.dispatch.apply_primitive; eager ops do."""
    from unittest import mock

    import jax._src.dispatch as dispatch

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=3, dtype=jnp.float32
    )
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in STREAMS]
    _, end_bias = builders[0].measure_biases()
    for i in range(4):
        segs = [
            _chunk_segs(builders[b], i, q, s)
            for b, (q, s) in enumerate(STREAMS)
        ]
        ve = jnp.asarray(vis_embeds_rounds[i])
        if i < 3:  # warm rounds (incl. first eviction at window_size=2)
            out = ms.process_round(segs, vis_embeds=ve, grid_thw=GRID)
        else:  # steady round: count eager primitive binds
            seen = []
            orig = dispatch.apply_primitive

            def counting(prim, *a, **k):
                seen.append(str(prim))
                return orig(prim, *a, **k)

            with mock.patch.object(dispatch, "apply_primitive", counting):
                handles = ms.process_round_async(
                    segs, vis_embeds=ve, grid_thw=GRID
                )
                out = ms.finish_round(handles)
            assert not seen, (
                f"steady round dispatched eager device ops: {seen} — each is "
                "a per-round host round-trip plus a first-use tiny-op compile "
                "mid-stream; move it into a jitted step or ship host numpy"
            )
        ms.commit_assistant([g for g, _ in out], end_bias, i)


def test_steady_chunk_has_no_eager_device_ops(params, vis_embeds_rounds):
    """Single-stream twin of the round guard: steady process_chunk_async +
    finish_chunk must not dispatch eager primitives (the chunk-0 spike class:
    a dtype-converting jnp.asarray of np.nonzero's int64 output)."""
    from unittest import mock

    import jax._src.dispatch as dispatch

    eng = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, end_bias = builder.measure_biases()
    for i in range(4):
        segs = _chunk_segs(builder, i, "describe the scene", 0.0)
        ve = jnp.asarray(vis_embeds_rounds[i, 0])
        if i < 3:
            gen, _ = eng.process_chunk(segs, grid_thw=GRID, vis_embeds=ve)
        else:
            seen = []
            orig = dispatch.apply_primitive

            def counting(prim, *a, **k):
                seen.append(str(prim))
                return orig(prim, *a, **k)

            with mock.patch.object(dispatch, "apply_primitive", counting):
                h = eng.process_chunk_async(segs, vis_embeds=ve, grid_thw=GRID)
                gen, _ = eng.finish_chunk(h)
            assert not seen, f"steady chunk dispatched eager device ops: {seen}"
        eng.commit_assistant(gen, end_bias, i)


def test_text_only_active_lane_in_uniform_vision_round(params, vis_embeds_rounds):
    """An ACTIVE lane whose chunk carries no video_pad tokens rides a
    uniform (stacked-embeds) vision round as visionless: its row of the
    stacked vis_embeds is scatter-dropped and its output equals a solo
    engine fed the same text-only chunk with no embeds at all. (Regression:
    the empty — not None — vis_slots of a text-only prep used to trip the
    uniform-count assertion.)"""
    n_rounds = 3
    text_only_round = 1  # lane 1's text-only round

    # solo references: lane 0 all-video; lane 1 text-only at round 1
    solo = [[], []]
    for b, (q, s) in enumerate(STREAMS[:2]):
        eng = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
        bld = PromptBuilder(TOK, FakeTokenizer(TOK))
        _, end_bias = bld.measure_biases()
        for i in range(n_rounds):
            if b == 1 and i == text_only_round:
                segs = _chunk_segs(bld, i, q, s, n_vid=0)
                gen, _ = eng.process_chunk(segs, grid_thw=GRID)
            else:
                segs = _chunk_segs(bld, i, q, s)
                gen, _ = eng.process_chunk(
                    segs, grid_thw=GRID,
                    vis_embeds=jnp.asarray(vis_embeds_rounds[i, b]),
                )
            eng.commit_assistant(gen, end_bias, i)
            solo[b].append(np.asarray(gen))

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in STREAMS[:2]]
    _, end_bias = builders[0].measure_biases()
    for i in range(n_rounds):
        segs = []
        for b, (q, s) in enumerate(STREAMS[:2]):
            n_vid = 0 if (b == 1 and i == text_only_round) else N_VID_TOK
            segs.append(_chunk_segs(builders[b], i, q, s, n_vid=n_vid))
        out = ms.process_round(
            segs,
            vis_embeds=jnp.asarray(vis_embeds_rounds[i, :2]),
            grid_thw=GRID,
        )
        gens = [g for g, _ in out]
        ms.commit_assistant(gens, end_bias, i)
        for b, g in enumerate(gens):
            np.testing.assert_array_equal(
                solo[b][i], np.asarray(g),
                err_msg=f"stream {b} round {i}: batched != solo",
            )
    for e in ms.engines:
        assert e.cached + e.uncached_tail == e.table.total_len()


def test_multistream_prewarm_covers_round_on_mesh(params):
    """Prewarm must compile with the SAME input commitments real rounds use:
    under a mesh the lane rngs are committed to a lane sharding, and a
    committed input is a different jit-cache entry than an uncommitted one —
    a sharded round after prewarm must trigger zero new compilation
    (regression: prewarm used fresh uncommitted PRNG keys and round 0
    recompiled the whole batched step mid-stream)."""
    from streaming_vlm_tpu.parallel.mesh import make_mesh, shard_params
    from streaming_vlm_tpu.streaming.engine import chunk_step_batched

    mesh = make_mesh({"data": 1, "model": 2})
    sharded, _ = shard_params(params, mesh)
    ms = MultiStreamEngine(
        CFG, sharded, _stream_cfg(), _greedy(), n_streams=2,
        dtype=jnp.float32, mesh=mesh,
    )
    ms.prewarm(grids=(GRID,))
    size0 = chunk_step_batched._cache_size()
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(2)]
    _, end_bias = builders[0].measure_biases()
    rng = np.random.default_rng(0)
    D = CFG.text.hidden_size
    segs = [_chunk_segs(builders[b], 0, "q", 0.0) for b in range(2)]
    ve = rng.normal(size=(2, N_VID_TOK, D)).astype(np.float32) * 0.1
    out = ms.process_round(segs, vis_embeds=jnp.asarray(ve), grid_thw=GRID)
    ms.commit_assistant([g for g, _ in out], end_bias, 0)
    assert chunk_step_batched._cache_size() == size0, (
        "sharded round compiled a new batched-step executable after prewarm"
    )


def test_round_capacity_error_is_atomic(params):
    """A round that cannot fit (here: an absurd shared decode budget) must
    raise BEFORE any lane's table is mutated: every engine keeps
    cached + uncached_tail == table length, and the SAME round retried with
    a sane budget produces exactly what an undisturbed engine pair would."""
    def fresh():
        ms = MultiStreamEngine(
            CFG, params, _stream_cfg(), _greedy(), n_streams=2,
            dtype=jnp.float32,
        )
        bs = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(2)]
        return ms, bs, bs[0].measure_biases()[1]

    rng = np.random.default_rng(0)
    D = CFG.text.hidden_size

    def round_inputs(builders, i):
        segs = [_chunk_segs(builders[b], i, "q", 0.0) for b in range(2)]
        ve = np.random.default_rng(50 + i).normal(size=(2, N_VID_TOK, D)).astype(np.float32) * 0.1
        return segs, jnp.asarray(ve)

    ms_ref, b_ref, eb = fresh()
    ref = []
    for i in range(2):
        segs, ve = round_inputs(b_ref, i)
        out = ms_ref.process_round(segs, vis_embeds=ve, grid_thw=GRID)
        ms_ref.commit_assistant([g for g, _ in out], eb, i)
        ref.append([np.asarray(g) for g, _ in out])

    ms, bld, eb2 = fresh()
    for i in range(2):
        segs, ve = round_inputs(bld, i)
        if i == 1:
            with pytest.raises(ValueError, match="No lane state was modified"):
                ms.process_round(
                    segs, vis_embeds=ve, grid_thw=GRID, max_new=10**6
                )
            for e in ms.engines:
                assert e.cached + e.uncached_tail == e.table.total_len()
        out = ms.process_round(segs, vis_embeds=ve, grid_thw=GRID)
        ms.commit_assistant([g for g, _ in out], eb2, i)
        for b in range(2):
            np.testing.assert_array_equal(ref[i][b], np.asarray(out[b][0]))


def test_prewarm_covers_uniform_mixed_round_compiles(params):
    """The serving front-end ALWAYS takes the mixed-embeds path (per-lane
    vis_embeds list), even when every client streams ONE resolution — and
    that path runs eager pad/stack/zeros tiny-ops whose first use is a
    remote compile mid-stream. prewarm must warm them for EVERY round-max
    count, including the single-grid case and an idle-lane round
    (regression: the warm block only ran for len(counts) > 1 and only for
    counts[1:], so uniform-resolution servers glitched on round 0)."""
    import jax._src.test_util as jtu

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=3, dtype=jnp.float32
    )
    ms.prewarm(grids=(GRID,))
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in STREAMS]
    _, end_bias = builders[0].measure_biases()
    rng = np.random.default_rng(5)
    D = CFG.text.hidden_size
    clocks = [0, 0, 0]
    for i in range(3):
        segs, ve = [], []
        for b, (q, s) in enumerate(STREAMS):
            if b == 2 and i == 1:  # idle lane: zeros row + rng freeze
                segs.append(None)
                ve.append(None)
            else:
                segs.append(_chunk_segs(builders[b], clocks[b], q, s))
                ve.append(
                    jnp.asarray(
                        rng.normal(size=(N_VID_TOK, D)).astype(np.float32) * 0.1
                    )
                )
        with jtu.count_jit_compilation_cache_miss() as misses:
            out = ms.process_round(segs, vis_embeds=ve, grid_thw=[GRID] * 3)
        assert misses() == 0, (
            f"round {i} compiled {misses()} executable(s) after prewarm — "
            "a first-use tiny-op (pad/stack/zeros/where) the warm block "
            "missed; over the TPU tunnel each is a mid-stream glitch"
        )
        for b in range(3):
            if out[b] is None:
                continue
            ms.engines[b].commit_assistant(out[b][0], end_bias, clocks[b])
            clocks[b] += 1
