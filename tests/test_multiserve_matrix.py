"""Full serving matrix: OVERSUBSCRIPTION x MIXED GRIDS x PER-LANE BUDGETS
in the same rounds — the realistic deployment shape where heterogeneous
clients outnumber device lanes. Every client must still equal its solo
engine bitwise (paging + padding + budget capping are all invisible)."""

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
PATCH_DIM = (
    CFG.vision.in_channels * CFG.vision.temporal_patch_size * CFG.vision.patch_size**2
)
END_BIAS = 2
N_CHUNKS = 3

# three clients, two lanes: mixed resolutions AND mixed decode budgets
CLIENTS = [
    dict(query="narrate the game", seed0=700, grid=(1, 4, 4), max_new=None),
    dict(query="describe the scene", seed0=900, grid=(1, 6, 4), max_new=3),
    dict(query="watch the crowd", seed0=1100, grid=(1, 4, 4), max_new=5),
]


def _n_vid(grid):
    return grid[0] * (grid[1] // 2) * (grid[2] // 2)


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


def _chunk(builder, i, spec):
    rng = np.random.default_rng(spec["seed0"] + i)
    grid = spec["grid"]
    patches = rng.normal(size=(int(np.prod(grid)), PATCH_DIM)).astype(np.float32) * 0.1
    segs = []
    if i == 0:
        segs.append(builder.system_segment())
        segs.extend(builder.previous_text_segments("prev " + spec["query"]))
        segs.extend(
            builder.user_turn_segments(
                0, 0.0, 1.0, _n_vid(grid), grid, 1.0, query=spec["query"]
            )
        )
    else:
        segs.extend(
            builder.user_turn_segments(
                i, float(i), float(i + 1), _n_vid(grid), grid, 1.0
            )
        )
    segs.extend(builder.assistant_open_segments(i))
    return segs, patches


def _solo(params, spec):
    eng = StreamingEngine(CFG, params, _stream_cfg(), _greedy(), dtype=jnp.float32)
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    gens = []
    for i in range(N_CHUNKS):
        segs, patches = _chunk(builder, i, spec)
        gen, _ = eng.process_chunk(
            segs,
            pixel_patches=patches,
            grid_thw=spec["grid"],
            max_new=spec["max_new"],
        )
        eng.commit_assistant(gen, END_BIAS, i)
        gens.append(np.asarray(gen))
    return gens


def test_oversubscribed_mixed_grid_budgeted_clients(params):
    """Three heterogeneous clients (two resolutions, two decode budgets)
    share two lanes; rounds mix paged-in and resident lanes at different
    grids and budgets. Every client == its solo engine bitwise, and paging
    really happened."""
    solos = [_solo(params, s) for s in CLIENTS]

    ms = MultiStreamEngine(
        CFG, params, _stream_cfg(), _greedy(), n_streams=2, dtype=jnp.float32
    )
    srv = MultiStreamServer(ms, end_bias=END_BIAS, max_clients=3)
    clients = [srv.attach() for _ in CLIENTS]
    builders = [PromptBuilder(TOK, FakeTokenizer(TOK)) for _ in CLIENTS]

    got = [[] for _ in CLIENTS]
    for i in range(N_CHUNKS):
        for c, bld, spec in zip(clients, builders, CLIENTS):
            segs, patches = _chunk(bld, i, spec)
            c.submit(
                segs,
                pixel_patches=patches,
                grid_thw=spec["grid"],
                max_new=spec["max_new"],
            )
        # 3 pending chunks on 2 lanes: 2 rounds drain them (2 + 1 active)
        assert srv.run_round_once() == 2
        assert srv.run_round_once() == 1
        for k, c in enumerate(clients):
            idx, gen = c.get(timeout=1)
            assert idx == i
            got[k].append(gen)

    assert srv.swaps > 0
    for k, (solo, rows) in enumerate(zip(solos, got)):
        for i, gen in enumerate(rows):
            np.testing.assert_array_equal(
                solo[i], gen, err_msg=f"client {k} chunk {i}"
            )
    # budget caps really bound the emission (+1 for the host-side forced
    # <|im_end|> close, reference inference.py:456-459)
    for k, spec in enumerate(CLIENTS):
        if spec["max_new"] is not None:
            assert all(len(g) <= spec["max_new"] + 1 for g in got[k])
