"""MultiStreamServer: asynchronous multi-client serving over dynamic lanes.
Deterministic rounds must equal solo engines; the background thread must
deliver every submitted chunk; lane exhaustion raises."""

import queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.engine import StreamingEngine
from streaming_vlm_tpu.streaming.multiserve import MultiStreamServer
from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
GRID = (1, 4, 4)
PATCH_DIM = (
    CFG.vision.in_channels * CFG.vision.temporal_patch_size * CFG.vision.patch_size**2
)
N_VID_TOK = GRID[0] * (GRID[1] // 2) * (GRID[2] // 2)
END_BIAS = 2


def _stream_cfg():
    return StreamConfig(
        text_round=3, window_size=2, chunk_duration=1, text_sink=8,
        text_sliding_window=8, max_tokens_per_chunk=6, kv_capacity=1024,
        prefill_buckets=(64, 128),
    )


def _greedy():
    return SamplingConfig(do_sample=False, repetition_penalty=1.05)


@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(11), dtype=jnp.float32)


def _chunk(builder, i, query, patches_seed):
    rng = np.random.default_rng(patches_seed)
    patches = rng.normal(size=(int(np.prod(GRID)), PATCH_DIM)).astype(np.float32) * 0.1
    segs = []
    if i == 0:
        segs.append(builder.system_segment())
        segs.extend(builder.previous_text_segments("prev " + query))
        segs.extend(
            builder.user_turn_segments(0, 0.0, 1.0, N_VID_TOK, GRID, 1.0, query=query)
        )
    else:
        segs.extend(
            builder.user_turn_segments(i, float(i), float(i + 1), N_VID_TOK, GRID, 1.0)
        )
    segs.extend(builder.assistant_open_segments(i))
    return segs, patches


def _solo_run(params, query, n_chunks, seed0):
    eng = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    gens = []
    for i in range(n_chunks):
        segs, patches = _chunk(builder, i, query, seed0 + i)
        gen, _ = eng.process_chunk(segs, pixel_patches=patches, grid_thw=GRID)
        eng.commit_assistant(gen, END_BIAS, i)
        gens.append(np.asarray(gen))
    return gens


def test_server_rounds_match_solo(params):
    """Client A streams 4 chunks; client B attaches mid-flight (A's chunk 2)
    and streams 2; every delivered generation equals the solo engines'."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)

    solo_a = _solo_run(params, "narrate the game", 4, seed0=100)
    solo_b = _solo_run(params, "describe the scene", 2, seed0=500)

    a = srv.attach()
    ba = PromptBuilder(TOK, FakeTokenizer(TOK))
    bb = None
    b = None
    got_a, got_b = [], []
    for rnd in range(4):
        segs, patches = _chunk(ba, rnd, "narrate the game", 100 + rnd)
        a.submit(segs, pixel_patches=patches, grid_thw=GRID)
        if rnd == 2:
            b = srv.attach()
            bb = PromptBuilder(TOK, FakeTokenizer(TOK))
        if b is not None and rnd >= 2:
            segs, patches = _chunk(bb, rnd - 2, "describe the scene", 500 + rnd - 2)
            b.submit(segs, pixel_patches=patches, grid_thw=GRID)
        n = srv.run_round_once()
        assert n == (1 if rnd < 2 else 2)
        got_a.append(a.get(timeout=1))
        if rnd >= 2:
            got_b.append(b.get(timeout=1))

    for i, (idx, gen) in enumerate(got_a):
        assert idx == i
        np.testing.assert_array_equal(solo_a[i], gen, err_msg=f"client A chunk {i}")
    for i, (idx, gen) in enumerate(got_b):
        assert idx == i
        np.testing.assert_array_equal(solo_b[i], gen, err_msg=f"client B chunk {i}")

    # detach frees the lane for a third client
    a.close()
    c = srv.attach()
    assert c.lane == a.lane


def test_server_to_server_migration(params):
    """A client snapshots off server 1 and re-attaches on a DIFFERENT server
    (fresh engine — another process/chip in deployment) via
    attach(snapshot=...): its stream continues exactly where it left off,
    chunk clock included, next to an unrelated client on the new server."""
    solo = _solo_run(params, "narrate the game", 5, seed0=100)

    ms1 = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv1 = MultiStreamServer(ms1, end_bias=END_BIAS)
    a = srv1.attach()
    ba = PromptBuilder(TOK, FakeTokenizer(TOK))
    for i in range(3):
        segs, patches = _chunk(ba, i, "narrate the game", 100 + i)
        a.submit(segs, pixel_patches=patches, grid_thw=GRID)
        srv1.run_round_once()
        idx, gen = a.get(timeout=1)
        np.testing.assert_array_equal(solo[i], gen)
    snap = a.snapshot()
    a.close()

    ms2 = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv2 = MultiStreamServer(ms2, end_bias=END_BIAS)
    other = srv2.attach()  # unrelated client occupies lane 0 first
    bo = PromptBuilder(TOK, FakeTokenizer(TOK))
    m = srv2.attach(snapshot=snap)
    assert m.chunk_index == 3
    for j in range(2):
        segs, patches = _chunk(ba, 3 + j, "narrate the game", 100 + 3 + j)
        m.submit(segs, pixel_patches=patches, grid_thw=GRID)
        segs_o, patches_o = _chunk(bo, j, "other stream", 700 + j)
        other.submit(segs_o, pixel_patches=patches_o, grid_thw=GRID)
        assert srv2.run_round_once() == 2
        idx, gen = m.get(timeout=1)
        assert idx == 3 + j
        np.testing.assert_array_equal(solo[3 + j], gen, err_msg=f"chunk {3+j}")
        other.get(timeout=1)


def test_server_lane_exhaustion(params):
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms)
    srv.attach()
    srv.attach()
    with pytest.raises(RuntimeError, match="client slots taken"):
        srv.attach()


def test_server_background_thread(params):
    """Background scheduler delivers every chunk of two concurrent clients."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    srv.start()
    try:
        clients = [srv.attach(), srv.attach()]
        builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in clients]
        for i in range(3):
            for c, bld, q in zip(clients, builders, ("alpha", "beta")):
                segs, patches = _chunk(bld, i, q, 900 + 10 * c.lane + i)
                c.submit(segs, pixel_patches=patches, grid_thw=GRID)
        for c in clients:
            for i in range(3):
                idx, gen = c.get(timeout=60)
                assert idx == i and len(gen) >= 1
    finally:
        srv.stop()
    for e in ms.engines:
        assert e.cached + e.uncached_tail == e.table.total_len()


GRID_B = (1, 6, 4)  # second client resolution: 6 merged vision tokens
N_VID_TOK_B = GRID_B[0] * (GRID_B[1] // 2) * (GRID_B[2] // 2)


def _chunk_g(builder, i, query, patches_seed, grid, n_vid):
    rng = np.random.default_rng(patches_seed)
    patches = rng.normal(size=(int(np.prod(grid)), PATCH_DIM)).astype(np.float32) * 0.1
    segs = []
    if i == 0:
        segs.append(builder.system_segment())
        segs.extend(builder.previous_text_segments("prev " + query))
        segs.extend(
            builder.user_turn_segments(0, 0.0, 1.0, n_vid, grid, 1.0, query=query)
        )
    else:
        segs.extend(
            builder.user_turn_segments(i, float(i), float(i + 1), n_vid, grid, 1.0)
        )
    segs.extend(builder.assistant_open_segments(i))
    return segs, patches


def test_server_mixed_resolution_clients(params):
    """Two clients at DIFFERENT video resolutions submit into the SAME
    rounds; each client's generations equal a solo engine at its own grid
    (mixed-grid rounds: per-lane grids + padded vision counts)."""
    n_chunks = 3

    def solo(query, seed0, grid, n_vid):
        eng = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
        builder = PromptBuilder(TOK, FakeTokenizer(TOK))
        gens = []
        for i in range(n_chunks):
            segs, patches = _chunk_g(builder, i, query, seed0 + i, grid, n_vid)
            gen, _ = eng.process_chunk(segs, pixel_patches=patches, grid_thw=grid)
            eng.commit_assistant(gen, END_BIAS, i)
            gens.append(np.asarray(gen))
        return gens

    solo_a = solo("narrate the game", 700, GRID, N_VID_TOK)
    solo_b = solo("describe the scene", 900, GRID_B, N_VID_TOK_B)

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a, b = srv.attach(), srv.attach()
    ba, bb = PromptBuilder(TOK, FakeTokenizer(TOK)), PromptBuilder(TOK, FakeTokenizer(TOK))
    for rnd in range(n_chunks):
        segs, patches = _chunk_g(ba, rnd, "narrate the game", 700 + rnd, GRID, N_VID_TOK)
        a.submit(segs, pixel_patches=patches, grid_thw=GRID)
        segs, patches = _chunk_g(bb, rnd, "describe the scene", 900 + rnd, GRID_B, N_VID_TOK_B)
        b.submit(segs, pixel_patches=patches, grid_thw=GRID_B)
        assert srv.run_round_once() == 2
        ia, gen_a = a.get(timeout=5)
        ib, gen_b = b.get(timeout=5)
        assert (ia, ib) == (rnd, rnd)
        np.testing.assert_array_equal(solo_a[rnd], gen_a, err_msg=f"client A rnd {rnd}")
        np.testing.assert_array_equal(solo_b[rnd], gen_b, err_msg=f"client B rnd {rnd}")


def test_server_oversubscription_matches_solo(params):
    """FOUR clients share TWO device lanes (max_clients=4): idle streams are
    paged out to host snapshots and paged back in when their next chunk
    comes up. Every client's generations equal its solo engine bitwise, and
    swaps actually happen."""
    n_chunks = 3
    queries = ["alpha", "beta", "gamma", "delta"]
    seeds = [100, 500, 900, 1300]
    solos = [
        _solo_run(params, q, n_chunks, seed0=s) for q, s in zip(queries, seeds)
    ]

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS, max_clients=4)
    clients = [srv.attach() for _ in queries]
    assert [c.lane for c in clients[:2]] == [0, 1]
    assert [c.lane for c in clients[2:]] == [None, None]  # parked until scheduled
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in queries]

    got = [[] for _ in queries]
    for i in range(n_chunks):
        for c, bld, q, s in zip(clients, builders, queries, seeds):
            segs, patches = _chunk(bld, i, q, s + i)
            c.submit(segs, pixel_patches=patches, grid_thw=GRID)
        # 4 pending chunks, 2 lanes: two rounds drain one chunk per client
        assert srv.run_round_once() == 2
        assert srv.run_round_once() == 2
        for k, c in enumerate(clients):
            idx, gen = c.get(timeout=1)
            got[k].append((idx, gen))

    assert srv.swaps > 0  # paging really happened
    for k, (solo, rows) in enumerate(zip(solos, got)):
        for i, (idx, gen) in enumerate(rows):
            assert idx == i
            np.testing.assert_array_equal(
                solo[i], gen, err_msg=f"client {k} chunk {i}"
            )
    # accounting invariant on whatever engines currently hold lanes
    for e in ms.engines:
        assert e.cached + e.uncached_tail == e.table.total_len()


def test_server_oversubscription_sticky_residency(params):
    """<= n chatty clients never swap: two resident clients streaming while
    two parked clients stay silent costs zero evictions."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS, max_clients=4)
    clients = [srv.attach() for _ in range(4)]
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(2)]
    for i in range(3):
        for c, bld in zip(clients[:2], builders):
            segs, patches = _chunk(bld, i, "busy", 40 + i)
            c.submit(segs, pixel_patches=patches, grid_thw=GRID)
        assert srv.run_round_once() == 2
        for c in clients[:2]:
            c.get(timeout=1)
    assert srv.swaps == 0


def test_server_oversubscription_parked_snapshot_and_close(params):
    """A parked client can snapshot (migrate off-server) and close; closing
    a parked client never touches lanes."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS, max_clients=3)
    a, b = srv.attach(), srv.attach()
    bld = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs, patches = _chunk(bld, 0, "one", 77)
    a.submit(segs, pixel_patches=patches, grid_thw=GRID)
    srv.run_round_once()
    a.get(timeout=1)

    snap = a.snapshot()
    # make b more recently active than a, so a is the LRU eviction victim
    bld_b = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs, patches = _chunk(bld_b, 0, "two", 99)
    b.submit(segs, pixel_patches=patches, grid_thw=GRID)
    srv.run_round_once()
    b.get(timeout=1)
    # park a by scheduling a parked third client while a is idle
    c = srv.attach()
    bld_c = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs, patches = _chunk(bld_c, 0, "three", 88)
    c.submit(segs, pixel_patches=patches, grid_thw=GRID)
    srv.run_round_once()
    c.get(timeout=1)
    assert a.lane is None and srv.swaps == 1

    parked_snap = a.snapshot()  # snapshot while parked
    assert parked_snap["chunk_index"] == snap["chunk_index"] == 1
    lanes_before = list(srv._lanes)
    a.close()
    assert srv._lanes == lanes_before  # closing parked client frees no lane
    with pytest.raises(RuntimeError, match="client slots"):
        srv.attach(), srv.attach(), srv.attach()


def test_server_over_dp_mesh_oversubscribed(params):
    """The serving front-end composes with DP×TP lane sharding: a server
    whose engine spans a ('data','model') mesh (lane dim sharded over
    'data', weights replicated per group — shard_params_serving) serves
    MORE clients than lanes; every delivered generation equals the solo
    (unsharded) engines'. Covers oversubscription paging (snapshot/restore
    of lane rows) against the DP-sharded stacked arena."""
    from streaming_vlm_tpu.parallel.mesh import make_mesh, shard_params_serving

    mesh = make_mesh({"data": 2, "model": 2})
    sharded, _ = shard_params_serving(params, mesh)
    ms = MultiStreamEngine(
        CFG, sharded, _stream_cfg(), _greedy(), n_streams=2,
        dtype=jnp.float32, mesh=mesh,
    )
    assert ms.k_arena.sharding.shard_shape(ms.k_arena.shape)[0] == 1
    srv = MultiStreamServer(ms, end_bias=END_BIAS, max_clients=3)

    queries = ["narrate the game", "describe the scene", "track the ball"]
    solos = [
        _solo_run(params, q, 2, seed0=1000 * (i + 1))
        for i, q in enumerate(queries)
    ]

    clients = [srv.attach() for _ in range(3)]
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in range(3)]
    got = [[] for _ in range(3)]
    for rnd in range(2):
        for c, (cl, bu, q) in enumerate(zip(clients, builders, queries)):
            segs, patches = _chunk(bu, rnd, q, 1000 * (c + 1) + rnd)
            cl.submit(segs, pixel_patches=patches, grid_thw=GRID)
        # 3 pending clients over 2 lanes: two scheduler rounds drain the
        # wave (2 active lanes, then the paged-in third)
        assert srv.run_round_once() == 2
        assert srv.run_round_once() == 1
        for c, cl in enumerate(clients):
            got[c].append(cl.get(timeout=1))

    for c in range(3):
        for i, (idx, gen) in enumerate(got[c]):
            assert idx == i
            np.testing.assert_array_equal(
                solos[c][i], gen, err_msg=f"client {c} chunk {i}"
            )
    assert srv.swaps > 0  # paging really happened


def test_submit_validation_rejects_malformed(params):
    """Malformed submissions raise in the CLIENT's thread, before reaching
    the round loop (where a failure is fatal for every client), and the
    server keeps serving good chunks afterwards."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a = srv.attach()
    bld = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs, patches = _chunk(bld, 0, "narrate the game", 100)

    with pytest.raises(ValueError, match="rows but"):
        a.submit(segs, pixel_patches=patches[:-1], grid_thw=GRID)
    with pytest.raises(ValueError, match="video_pad tokens"):
        bad_grid = (1, GRID[1] * 2, GRID[2])
        bad_patches = np.concatenate([patches, patches], axis=0)
        a.submit(segs, pixel_patches=bad_patches, grid_thw=bad_grid)
    # video_pad tokens with no pixels at all: the model would silently
    # attend to garbage placeholder embeddings
    with pytest.raises(ValueError, match="no.*pixel_patches|pixel_patches"):
        a.submit(segs)
    # a chunk above the largest prefill bucket would raise inside the
    # batched round and fail-stop every client
    huge = [bld.system_segment() for _ in range(40)]
    assert sum(len(s.ids) for s in huge) > 128
    with pytest.raises(ValueError, match="prefill"):
        a.submit(huge)

    # nothing reached the queue; the server still serves correctly
    solo = _solo_run(params, "narrate the game", 1, seed0=100)
    a.submit(segs, pixel_patches=patches, grid_thw=GRID)
    assert srv.run_round_once() == 1
    idx, gen = a.get(timeout=1)
    assert idx == 0
    np.testing.assert_array_equal(solo[0], gen)
    assert srv.error is None


def test_server_fail_stop_wakes_blocked_get(params):
    """A failure inside a batched round fail-stops the server: every
    blocked get() raises (never hangs), and attach/submit/run_round_once
    refuse further work with the original exception chained."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    srv.start()
    try:
        a = srv.attach()
        b = srv.attach()
        bld = PromptBuilder(TOK, FakeTokenizer(TOK))

        boom = RuntimeError("injected round failure")

        def _explode(*args, **kwargs):
            raise boom

        ms.process_round = _explode  # fails mid-round, past validation
        segs, patches = _chunk(bld, 0, "narrate the game", 100)
        a.submit(segs, pixel_patches=patches, grid_thw=GRID)

        # BOTH clients' get() raise — including b, which never submitted
        with pytest.raises(RuntimeError, match="fail-stopped"):
            a.get(timeout=30)
        with pytest.raises(RuntimeError, match="fail-stopped"):
            b.get(timeout=30)
        assert srv.error is boom
        # repeated get() keeps raising (sentinel re-armed)
        with pytest.raises(RuntimeError, match="fail-stopped"):
            a.get(timeout=1)
        # further work is refused, chaining the original error
        with pytest.raises(RuntimeError, match="fail-stopped"):
            a.submit(segs, pixel_patches=patches, grid_thw=GRID)
        with pytest.raises(RuntimeError, match="fail-stopped"):
            srv.attach()
        with pytest.raises(RuntimeError, match="fail-stopped"):
            srv.run_round_once()
    finally:
        srv.stop()


def test_attach_rejects_incompatible_snapshot(params):
    """attach(snapshot=...) validates the snapshot in the CALLER's thread:
    on an oversubscribed server, placement happens lazily inside a batched
    round, where a restore failure would fail-stop every client."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a = srv.attach()
    bld = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs, patches = _chunk(bld, 0, "narrate the game", 100)
    a.submit(segs, pixel_patches=patches, grid_thw=GRID)
    srv.run_round_once()
    a.get(timeout=1)
    snap = a.snapshot()

    bad = dict(snap, kv_quant="int8")
    with pytest.raises(ValueError, match="kv_quant"):
        srv.attach(snapshot=bad)
    bad = dict(snap)
    del bad["table"]
    with pytest.raises(ValueError, match="missing field"):
        srv.attach(snapshot=bad)
    # the good snapshot still attaches, and the server is not fail-stopped
    m = srv.attach(snapshot=snap)
    assert m.chunk_index == 1 and srv.error is None


def test_double_close_does_not_free_successor_lane(params):
    """close() is idempotent: a second close() on a handle whose lane was
    already reassigned must not free the new owner's lane (regression:
    client.lane is deliberately left as a historical value)."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a = srv.attach()
    lane = a.lane
    a.close()
    b = srv.attach()
    assert b.lane == lane
    a.close()  # double close — must be a no-op
    assert srv._lanes[lane] is b
    c = srv.attach()  # the OTHER lane, not b's
    assert c.lane != lane


def test_round_admission_rejects_per_client(params):
    """A chunk that passes submit's static bound but cannot fit the lane's
    LIVE state (here: an absurd per-chunk decode budget vs kv_capacity) is
    rejected to ITS client only: get() raises once, the other client's
    round output is unaffected, and the rejected client keeps streaming."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a, b = srv.attach(), srv.attach()
    ba = PromptBuilder(TOK, FakeTokenizer(TOK))
    bb = PromptBuilder(TOK, FakeTokenizer(TOK))
    solo_b = _solo_run(params, "describe the scene", 2, seed0=500)

    segs_a, patches_a = _chunk(ba, 0, "narrate the game", 100)
    a.submit(segs_a, pixel_patches=patches_a, grid_thw=GRID, max_new=10**6)
    segs_b, patches_b = _chunk(bb, 0, "describe the scene", 500)
    b.submit(segs_b, pixel_patches=patches_b, grid_thw=GRID)
    assert srv.run_round_once() == 1  # only b admitted
    with pytest.raises(ValueError, match="kv_capacity"):
        a.get(timeout=1)
    idx, gen = b.get(timeout=1)
    np.testing.assert_array_equal(solo_b[0], gen)
    assert srv.error is None  # NOT fail-stopped

    # the rejected client continues from where it left off (chunk 0 was
    # never processed — its chunk clock did not advance)
    solo_a = _solo_run(params, "narrate the game", 1, seed0=100)
    a.submit(segs_a, pixel_patches=patches_a, grid_thw=GRID)
    segs_b1, patches_b1 = _chunk(bb, 1, "describe the scene", 501)
    b.submit(segs_b1, pixel_patches=patches_b1, grid_thw=GRID)
    assert srv.run_round_once() == 2
    idx, gen = a.get(timeout=1)
    assert idx == 0
    np.testing.assert_array_equal(solo_a[0], gen)
    idx, gen = b.get(timeout=1)
    assert idx == 1
    np.testing.assert_array_equal(solo_b[1], gen)


def test_submit_rejects_max_new_zero(params):
    """max_new=0 must raise in submit (caller's thread): the batched step
    asserts every lane budget >= 1, so an admitted 0 would fail-stop the
    whole server mid-round. Regression: admission's old falsy-zero
    `or`-default substituted the default budget and admitted it."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a = srv.attach()
    bld = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs, patches = _chunk(bld, 0, "narrate the game", 100)
    with pytest.raises(ValueError, match="max_new must be >= 1"):
        a.submit(segs, pixel_patches=patches, grid_thw=GRID, max_new=0)
    # queue untouched; the server still serves and is not fail-stopped
    solo = _solo_run(params, "narrate the game", 1, seed0=100)
    a.submit(segs, pixel_patches=patches, grid_thw=GRID)
    assert srv.run_round_once() == 1
    np.testing.assert_array_equal(solo[0], a.get(timeout=1)[1])
    assert srv.error is None


def test_submit_rejects_bad_grid_geometry(params):
    """A grid the vision tower cannot reshape (h/w not multiples of
    spatial_merge_size) or patches of the wrong feature width must be THIS
    client's error at submit time — inside the round loop they would crash
    encode_round_mixed and fail-stop every client."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a = srv.attach()
    bld = PromptBuilder(TOK, FakeTokenizer(TOK))

    # (1, 7, 7): 49 patches, 49 // merge_unit = 12 video_pad tokens — both
    # of submit's original counting checks pass, but 7 % 2 != 0
    bad_grid = (1, 7, 7)
    n_vid = int(np.prod(bad_grid)) // CFG.vision.spatial_merge_unit
    segs = bld.user_turn_segments(0, 0.0, 1.0, n_vid, bad_grid, 1.0)
    segs.extend(bld.assistant_open_segments(0))
    patches = np.zeros((int(np.prod(bad_grid)), PATCH_DIM), np.float32)
    with pytest.raises(ValueError, match="valid vision grid"):
        a.submit(segs, pixel_patches=patches, grid_thw=bad_grid)

    # wrong patch feature width on a valid grid
    segs2, good_patches = _chunk(bld, 0, "narrate", 7)
    with pytest.raises(ValueError, match="pixel_patches must be"):
        a.submit(segs2, pixel_patches=good_patches[:, :-1], grid_thw=GRID)
    assert srv.error is None


def test_shared_admission_rejects_round_budget_conflict(params):
    """Two INDIVIDUALLY-valid submissions that cannot share a round: lane
    B's huge (but alone-affordable) max_new becomes the round-shared decode
    budget, overflowing lane A. The offending chunk (B's) is rejected to B
    only; A's chunk runs and matches solo; the server never fail-stops."""
    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    C = _stream_cfg().kv_capacity
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a, b = srv.attach(), srv.attach()
    ba = PromptBuilder(TOK, FakeTokenizer(TOK))
    solo_a = _solo_run(params, "narrate the game", 1, seed0=100)

    segs_a, patches_a = _chunk(ba, 0, "narrate the game", 100)
    n_a = sum(len(s.ids) for s in segs_a)
    tiny = PromptBuilder(TOK, FakeTokenizer(TOK)).assistant_open_segments(0)
    n_b = sum(len(s.ids) for s in tiny)
    mx = C - n_b - 1  # B alone: cached 0 + n_b + mx = C - 1 fits
    assert n_a + mx > C  # ...but as the ROUND budget it overflows lane A

    a.submit(segs_a, pixel_patches=patches_a, grid_thw=GRID)
    b.submit(tiny, max_new=mx)
    assert srv.run_round_once() == 1  # only A ran
    with pytest.raises(ValueError, match="round decode budget"):
        b.get(timeout=1)
    idx, gen = a.get(timeout=1)
    assert idx == 0
    np.testing.assert_array_equal(solo_a[0], gen)
    assert srv.error is None

    # B keeps streaming normally after the rejection (its lane is virgin —
    # the rejected chunk never touched the table)
    solo_b = _solo_run(params, "describe the scene", 1, seed0=500)
    bb = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs_b, patches_b = _chunk(bb, 0, "describe the scene", 500)
    b.submit(segs_b, pixel_patches=patches_b, grid_thw=GRID)
    assert srv.run_round_once() == 1
    np.testing.assert_array_equal(solo_b[0], b.get(timeout=1)[1])


def test_shared_admission_rejects_round_bucket_conflict(params):
    """The shared-BUCKET variant: lane A builds up occupancy (no eviction),
    then lane B submits a chunk bucketing at 128 while A's steady chunks
    bucket at 64. B's chunk alone is fine (its lane is empty), A's chunk
    alone is fine — together the shared 128 bucket overflows lane A, so
    B's chunk is rejected and A's round proceeds untouched."""
    def cfg(C):
        return StreamConfig(
            text_round=100, window_size=100, chunk_duration=1,
            text_sink=None, text_sliding_window=None,
            max_tokens_per_chunk=6, kv_capacity=C, prefill_buckets=(64, 128),
        )

    C = 320
    ms = MultiStreamEngine(
        CFG, params, cfg(C), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a, b = srv.attach(), srv.attach()
    ba = PromptBuilder(TOK, FakeTokenizer(TOK))

    # solo oracle for A under the same no-eviction config
    solo_eng = StreamingEngine(CFG, params, cfg(C), _greedy(), dtype=jnp.float32)
    solo_bld = PromptBuilder(TOK, FakeTokenizer(TOK))
    solo_gens = []

    # stream A until one more shared-128 round would overflow its lane
    i = 0
    while True:
        e = ms.engines[a.lane]
        segs, patches = _chunk(ba, i, "narrate the game", 100 + i)
        s_segs, s_patches = _chunk(solo_bld, i, "narrate the game", 100 + i)
        if e.cached + 128 > C:
            break
        a.submit(segs, pixel_patches=patches, grid_thw=GRID)
        assert srv.run_round_once() == 1
        idx, gen = a.get(timeout=1)
        s_gen, _ = solo_eng.process_chunk(
            s_segs, pixel_patches=s_patches, grid_thw=GRID
        )
        solo_eng.commit_assistant(s_gen, END_BIAS, i)
        np.testing.assert_array_equal(np.asarray(s_gen), gen)
        solo_gens.append(gen)
        i += 1
        assert i < 8, "test config never reached the conflict window"
    e = ms.engines[a.lane]
    n_a = sum(len(s.ids) for s in segs) + e.uncached_tail
    # A's own next chunk still fits at its own 64 bucket...
    assert e.cached + max(64, n_a + 6) <= C

    # ...but B's chunk is sized (via its query) to bucket at exactly 128
    probe = _chunk(PromptBuilder(TOK, FakeTokenizer(TOK)), 0, "", 900)[0]
    base = sum(len(s.ids) for s in probe)
    assert base <= 128
    # the query text lands in BOTH the prev-text and the user turn, so each
    # added character (char-level FakeTokenizer) adds ~2 tokens
    long_q = "x" * max(0, (65 - base + 1) // 2)
    bb = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs_b, patches_b = _chunk(bb, 0, long_q, 900)
    n_b = sum(len(s.ids) for s in segs_b)
    assert 64 < n_b <= 128
    assert n_b + 6 <= C  # B alone is trivially fine on an empty lane

    a.submit(segs, pixel_patches=patches, grid_thw=GRID)
    b.submit(segs_b, pixel_patches=patches_b, grid_thw=GRID)
    assert srv.run_round_once() == 1  # only A ran
    with pytest.raises(ValueError, match="shared prefill bucket"):
        b.get(timeout=1)
    idx, gen = a.get(timeout=1)
    assert idx == i
    s_gen, _ = solo_eng.process_chunk(
        s_segs, pixel_patches=s_patches, grid_thw=GRID
    )
    np.testing.assert_array_equal(np.asarray(s_gen), gen)
    assert srv.error is None


def test_admission_sees_post_evict_occupancy(params):
    """kv_capacity sized to the engine's POST-evict high-water (what its
    own capacity errors tell operators to size to) must stream forever
    through the server: admission runs after the round's eviction, so it
    judges the same occupancy the batched step certifies. Regression:
    checking PRE-evict `cached` permanently rejected steady-state chunks
    that a solo engine with the identical config streams fine."""
    from streaming_vlm_tpu.streaming.engine import _bucket

    n_chunks = 6

    def stream_cfg(C):
        return StreamConfig(
            text_round=3, window_size=2, chunk_duration=1, text_sink=8,
            text_sliding_window=8, max_tokens_per_chunk=6, kv_capacity=C,
            prefill_buckets=(64, 128),
        )

    # pass 1: measure the minimal feasible capacity (post-evict high-water)
    # and the PRE-evict one, to prove the test discriminates
    eng = StreamingEngine(CFG, params, stream_cfg(1024), _greedy(), dtype=jnp.float32)
    bld = PromptBuilder(TOK, FakeTokenizer(TOK))
    hw_post = hw_pre = 0
    for i in range(n_chunks):
        segs, patches = _chunk(bld, i, "narrate the game", 100 + i)
        n_tok = sum(len(s.ids) for s in segs)

        def hw(e):
            n_real = e.uncached_tail + n_tok
            return e.cached + max(_bucket(n_real, (64, 128)), n_real + 6)

        hw_pre = max(hw_pre, hw(eng))
        eng.evict()  # idempotent — process_chunk re-runs it as a no-op
        hw_post = max(hw_post, hw(eng))
        gen, _ = eng.process_chunk(segs, pixel_patches=patches, grid_thw=GRID)
        eng.commit_assistant(gen, END_BIAS, i)
    assert hw_pre > hw_post, "config never evicted; test proves nothing"

    # pass 2: solo oracle at exactly the minimal capacity
    eng = StreamingEngine(
        CFG, params, stream_cfg(hw_post), _greedy(), dtype=jnp.float32
    )
    bld = PromptBuilder(TOK, FakeTokenizer(TOK))
    solo = []
    for i in range(n_chunks):
        segs, patches = _chunk(bld, i, "narrate the game", 100 + i)
        gen, _ = eng.process_chunk(segs, pixel_patches=patches, grid_thw=GRID)
        eng.commit_assistant(gen, END_BIAS, i)
        solo.append(np.asarray(gen))

    # pass 3: the server at the same minimal capacity must admit every
    # chunk (pre-evict admission rejects from the first eviction round on)
    ms = MultiStreamEngine(
        CFG, params, stream_cfg(hw_post), _greedy(), n_streams=1,
        dtype=jnp.float32,
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS)
    a = srv.attach()
    bld = PromptBuilder(TOK, FakeTokenizer(TOK))
    for i in range(n_chunks):
        segs, patches = _chunk(bld, i, "narrate the game", 100 + i)
        a.submit(segs, pixel_patches=patches, grid_thw=GRID)
        assert srv.run_round_once() == 1
        idx, gen = a.get(timeout=1)
        assert idx == i
        np.testing.assert_array_equal(solo[i], gen, err_msg=f"chunk {i}")
    assert srv.error is None


def _make_recovering_server(params, *, snapshot_every=2, max_recoveries=3):
    def factory():
        return MultiStreamEngine(
            CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
        )

    return MultiStreamServer(
        factory(),
        end_bias=END_BIAS,
        engine_factory=factory,
        snapshot_every=snapshot_every,
        max_recoveries=max_recoveries,
    )


def _inject_fault_once(srv, msg="UNAVAILABLE: injected device fault (test)"):
    """Arm the CURRENT engine so its next process_round raises a device
    fault (instance attribute — the rebuilt engine is unaffected)."""

    def boom(*a, **k):
        raise RuntimeError(msg)

    srv.engine.process_round = boom


def test_auto_recovery_injected_fault(params):
    """VERDICT r3 next #2b: a device fault mid-round on an auto_recover
    server rebuilds the engine, restores every lane from its periodic
    snapshot, replays the journal, re-queues the in-flight chunks — and no
    client loses a token: the full 5-chunk output streams equal the
    no-fault solo runs bitwise."""
    srv = _make_recovering_server(params, snapshot_every=2)
    solo_a = _solo_run(params, "narrate the game", 5, seed0=100)
    solo_b = _solo_run(params, "describe the scene", 5, seed0=500)

    a, b = srv.attach(), srv.attach()
    ba = PromptBuilder(TOK, FakeTokenizer(TOK))
    bb = PromptBuilder(TOK, FakeTokenizer(TOK))
    got_a, got_b = [], []
    for rnd in range(5):
        segs, patches = _chunk(ba, rnd, "narrate the game", 100 + rnd)
        a.submit(segs, pixel_patches=patches, grid_thw=GRID)
        segs, patches = _chunk(bb, rnd, "describe the scene", 500 + rnd)
        b.submit(segs, pixel_patches=patches, grid_thw=GRID)
        if rnd == 3:
            _inject_fault_once(srv)
        n = srv.run_round_once()
        if n == 0:
            # the fault consumed this round; the chunks were re-queued and
            # run on a fresh engine
            assert srv.recoveries == 1
            n = srv.run_round_once()
        assert n == 2
        got_a.append(a.get(timeout=5))
        got_b.append(b.get(timeout=5))

    assert srv.recoveries == 1
    assert srv.error is None
    for i, (idx, gen) in enumerate(got_a):
        assert idx == i
        np.testing.assert_array_equal(solo_a[i], gen, err_msg=f"client A chunk {i}")
    for i, (idx, gen) in enumerate(got_b):
        assert idx == i
        np.testing.assert_array_equal(solo_b[i], gen, err_msg=f"client B chunk {i}")


def test_auto_recovery_does_not_catch_logic_errors(params):
    """Non-fault exceptions fail-stop even with auto_recover on: replaying
    a logic error would just re-raise it."""
    srv = _make_recovering_server(params)
    a = srv.attach()
    segs, patches = _chunk(PromptBuilder(TOK, FakeTokenizer(TOK)), 0, "q", 1)
    a.submit(segs, pixel_patches=patches, grid_thw=GRID)

    def boom(*a_, **k_):
        raise ValueError("logic bug, not a device fault")

    srv.engine.process_round = boom
    with pytest.raises(ValueError):
        srv.run_round_once()
    assert srv.error is not None
    assert srv.recoveries == 0
    with pytest.raises(RuntimeError):
        srv.attach()


def test_auto_recovery_respects_max_recoveries(params):
    """After max_recoveries faults the server fail-stops like before."""
    srv = _make_recovering_server(params, max_recoveries=1)
    a = srv.attach()
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    segs, patches = _chunk(builder, 0, "q", 1)
    a.submit(segs, pixel_patches=patches, grid_thw=GRID)
    _inject_fault_once(srv)
    assert srv.run_round_once() == 0  # first fault: recovered
    assert srv.recoveries == 1
    assert srv.run_round_once() == 1  # re-queued chunk runs
    a.get(timeout=5)

    segs, patches = _chunk(builder, 1, "q", 2)
    a.submit(segs, pixel_patches=patches, grid_thw=GRID)
    _inject_fault_once(srv)
    with pytest.raises(RuntimeError):
        srv.run_round_once()  # budget exhausted -> fail-stop
    assert srv.error is not None
