"""Live-stream snapshot / restore / migration (streaming/snapshot.py).

Contract: restoring a snapshot and continuing produces EXACTLY the tokens
the uninterrupted engine would have produced — across engine instances,
position modes, arena representations (bf16 / int8), greedy and sampled
(the RNG key is snapshotted), file round-trips, and solo <-> multi-stream
lane migrations. The reference cannot do any of this (all streaming state
is implicit in one process, inference.py:181-522)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.engine import StreamingEngine
from streaming_vlm_tpu.streaming.multistream import MultiStreamEngine
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder
from streaming_vlm_tpu.streaming.snapshot import load_snapshot, save_snapshot

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
GRID = (1, 4, 4)
N_VID_TOK = GRID[0] * (GRID[1] // 2) * (GRID[2] // 2)
N_TOTAL = 6  # past text_round=3 / window_size=2 -> evictions active
N_CUT = 3  # snapshot point


def _stream_cfg(**kw):
    d = dict(
        text_round=3, window_size=2, chunk_duration=1, text_sink=8,
        text_sliding_window=8, max_tokens_per_chunk=6, kv_capacity=1024,
        prefill_buckets=(64, 128),
    )
    d.update(kw)
    return StreamConfig(**d)


@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(11), dtype=jnp.float32)


@pytest.fixture(scope="module")
def vis_rounds():
    rng = np.random.default_rng(5)
    D = CFG.text.hidden_size
    return rng.normal(size=(N_TOTAL, 2, N_VID_TOK, D)).astype(np.float32) * 0.1


def _chunk_segs(builder, i):
    segs = []
    if i == 0:
        segs.append(builder.system_segment())
        segs.extend(builder.previous_text_segments("prev text"))
        segs.extend(
            builder.user_turn_segments(
                0, 0.0, 1.0, N_VID_TOK, GRID, 1.0, query="describe"
            )
        )
    else:
        segs.extend(
            builder.user_turn_segments(
                i, float(i), float(i + 1), N_VID_TOK, GRID, 1.0
            )
        )
    segs.extend(builder.assistant_open_segments(i))
    return segs


def _drive(engine, builder, end_bias, i0, i1, vis_rounds, b=0):
    gens = []
    for i in range(i0, i1):
        segs = _chunk_segs(builder, i)
        gen, _ = engine.process_chunk(
            segs, grid_thw=GRID, vis_embeds=jnp.asarray(vis_rounds[i, b])
        )
        engine.commit_assistant(gen, end_bias, i)
        assert engine.cached + engine.uncached_tail == engine.table.total_len()
        gens.append(np.asarray(gen).tolist())
    return gens


def _fresh(params, scfg, sampling=None):
    eng = StreamingEngine(
        CFG, params, scfg,
        sampling or SamplingConfig(do_sample=False, repetition_penalty=1.05),
        dtype=jnp.float32,
    )
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, end_bias = builder.measure_biases()
    return eng, builder, end_bias


@pytest.mark.parametrize(
    "kv_quant,pos_mode,cut",
    [
        ("none", "shrink", 1),  # pre-eviction cut (table still growing)
        ("none", "shrink", 3),  # cut exactly when relocation begins
        ("none", "shrink", 5),  # steady-eviction cut
        ("none", "append", 3),
        ("int8", "shrink", 3),
    ],
)
def test_restore_continues_bitwise(params, vis_rounds, kv_quant, pos_mode, cut):
    """snapshot at chunk `cut`, restore into a FRESH engine, continue: the
    tail equals the uninterrupted stream's exactly (arena prefix + table +
    positions + accounting all survive) — at pre-eviction, eviction-onset
    and steady-eviction cut points."""
    scfg = _stream_cfg(kv_quant=kv_quant, pos_mode=pos_mode)
    eng, builder, eb = _fresh(params, scfg)
    head = _drive(eng, builder, eb, 0, cut, vis_rounds)
    snap = eng.snapshot()
    ref_tail = _drive(eng, builder, eb, cut, N_TOTAL, vis_rounds)

    eng2, builder2, eb2 = _fresh(params, scfg)
    eng2.restore(snap)
    assert eng2.chunk_index == cut
    assert eng2.cached + eng2.uncached_tail == eng2.table.total_len()
    tail = _drive(eng2, builder2, eb2, cut, N_TOTAL, vis_rounds)
    assert tail == ref_tail
    assert head  # stream produced something before the cut


def test_restore_sampled_continuation(params, vis_rounds):
    """do_sample=True: the snapshotted RNG key makes the restored
    continuation token-for-token identical."""
    scfg = _stream_cfg()
    sampling = SamplingConfig(
        do_sample=True, temperature=0.9, repetition_penalty=1.05, seed=3
    )
    eng, builder, eb = _fresh(params, scfg, sampling)
    _drive(eng, builder, eb, 0, N_CUT, vis_rounds)
    snap = eng.snapshot()
    ref_tail = _drive(eng, builder, eb, N_CUT, N_TOTAL, vis_rounds)

    eng2, builder2, eb2 = _fresh(params, scfg, sampling)
    eng2.restore(snap)
    tail = _drive(eng2, builder2, eb2, N_CUT, N_TOTAL, vis_rounds)
    assert tail == ref_tail


@pytest.mark.parametrize("kv_quant", ["none", "int8"])
def test_file_roundtrip(params, vis_rounds, tmp_path, kv_quant):
    """save_snapshot -> load_snapshot over .npz (no pickle) is lossless for
    the continuation (f32/bf16 ride as f32; int8 {q,s} ride natively)."""
    scfg = _stream_cfg(kv_quant=kv_quant)
    eng, builder, eb = _fresh(params, scfg)
    _drive(eng, builder, eb, 0, N_CUT, vis_rounds)
    snap = eng.snapshot()
    path = str(tmp_path / "stream.npz")
    save_snapshot(snap, path)
    ref_tail = _drive(eng, builder, eb, N_CUT, N_TOTAL, vis_rounds)

    eng2, builder2, eb2 = _fresh(params, scfg)
    eng2.restore(load_snapshot(path))
    tail = _drive(eng2, builder2, eb2, N_CUT, N_TOTAL, vis_rounds)
    assert tail == ref_tail


def test_restore_in_fresh_process(params, vis_rounds, tmp_path):
    """The real migration claim: a snapshot .npz written here restores in a
    SEPARATE python process (own jax runtime, weights rebuilt from the same
    seed) and produces the exact continuation."""
    import json
    import os
    import subprocess
    import sys

    eng, builder, eb = _fresh(params, _stream_cfg())
    _drive(eng, builder, eb, 0, N_CUT, vis_rounds)
    snap_path = str(tmp_path / "stream.npz")
    save_snapshot(eng.snapshot(), snap_path)
    ref_tail = _drive(eng, builder, eb, N_CUT, N_TOTAL, vis_rounds)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vis_path = str(tmp_path / "vis.npy")
    np.save(vis_path, np.asarray(vis_rounds))
    script = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import json, sys
sys.path.insert(0, {repr(repo)})
import numpy as np, jax.numpy as jnp
from tests.test_snapshot import _fresh, _drive, _stream_cfg, N_CUT, N_TOTAL, CFG
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.snapshot import load_snapshot
params = model.init_params(CFG, jax.random.PRNGKey(11), dtype=jnp.float32)
eng, builder, eb = _fresh(params, _stream_cfg())
eng.restore(load_snapshot({repr(snap_path)}))
vis = np.load({repr(vis_path)})
tail = _drive(eng, builder, eb, N_CUT, N_TOTAL, vis)
print("TAIL=" + json.dumps(tail))
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=900, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("TAIL=")][0]
    assert json.loads(line[5:]) == ref_tail


def test_restore_into_larger_capacity(params, vis_rounds):
    """A snapshot restores into an engine with a DIFFERENT (larger)
    kv_capacity — migration to a bigger-memory chip."""
    eng, builder, eb = _fresh(params, _stream_cfg())
    _drive(eng, builder, eb, 0, N_CUT, vis_rounds)
    snap = eng.snapshot()
    ref_tail = _drive(eng, builder, eb, N_CUT, N_TOTAL, vis_rounds)

    eng2, builder2, eb2 = _fresh(params, _stream_cfg(kv_capacity=2048))
    eng2.restore(snap)
    tail = _drive(eng2, builder2, eb2, N_CUT, N_TOTAL, vis_rounds)
    assert tail == ref_tail


def test_restore_rejects_mismatched_representation(params, vis_rounds):
    eng, builder, eb = _fresh(params, _stream_cfg())
    _drive(eng, builder, eb, 0, 1, vis_rounds)
    snap = eng.snapshot()
    eng2, _, _ = _fresh(params, _stream_cfg(kv_quant="int8"))
    with pytest.raises(ValueError, match="kv_quant"):
        eng2.restore(snap)


def test_streaming_inference_resume(params, tmp_path):
    """streaming_inference(resume_snapshot=...) continues an interrupted run
    of the same video: resumed responses equal the uninterrupted run's and
    the VTT accumulates all cues (fault recovery for long streams)."""
    from streaming_vlm_tpu.serve import StreamingSession, streaming_inference
    from streaming_vlm_tpu.video import ingest

    ingest.build_native()
    clip = str(tmp_path / "clip.mp4")
    ingest.write_test_video(clip, w=64, h=48, n_frames=80, fps=10)
    scfg = _stream_cfg(prefill_buckets=(64, 128, 256), fps=2.0)
    kw = dict(
        cfg=CFG, params=params, tokenizer=FakeTokenizer(TOK), video_path=clip,
        stream=scfg, duration=6.0, quiet=True, dtype=jnp.float32,
    )
    full = streaming_inference(output_dir=str(tmp_path / "full.vtt"), **kw)

    # interrupted run: 3 chunks via the session API, snapshot, then hand the
    # snapshot to streaming_inference for the remainder
    from streaming_vlm_tpu.video.ingest import ChunkedVideoSource

    sess = StreamingSession(
        CFG, params, FakeTokenizer(TOK), stream=scfg, dtype=jnp.float32
    )
    src = ChunkedVideoSource(clip, fps=scfg.fps)
    for i in range(3):
        patches, grid, _ = src.read_chunk(i * 1.0, (i + 1) * 1.0)
        sess.run_chunk(i, i * 1.0, pixel_patches=patches, grid_thw=grid)
    snap = sess.snapshot()

    tail = streaming_inference(
        output_dir=str(tmp_path / "tail.vtt"), resume_snapshot=snap, **kw
    )
    assert [r["response"] for r in tail] == [
        r["response"] for r in full[3:]
    ]
    assert [r["start_time"] for r in tail] == [3.0, 4.0, 5.0]


def test_migrate_solo_to_lane_and_back(params, vis_rounds):
    """Full migration cycle: a solo stream snapshots into a multi-stream
    lane (joining a batched server mid-flight, next to a fresh client on
    the other lane), continues bitwise, then snapshots back out to a solo
    engine and still matches the never-migrated control."""
    scfg = _stream_cfg()
    # control: uninterrupted solo stream, chunks 0..N_TOTAL
    ctrl, cb, eb = _fresh(params, scfg)
    ctrl_all = _drive(ctrl, cb, eb, 0, N_TOTAL, vis_rounds)

    # subject: solo for chunks 0..N_CUT, then migrate into lane 1
    solo, sb, _ = _fresh(params, scfg)
    _drive(solo, sb, eb, 0, N_CUT, vis_rounds)
    snap = solo.snapshot()

    ms = MultiStreamEngine(
        CFG, params, scfg,
        SamplingConfig(do_sample=False, repetition_penalty=1.05),
        n_streams=2, dtype=jnp.float32,
    )
    ms.restore_lane(1, snap)
    lane_builder = PromptBuilder(TOK, FakeTokenizer(TOK))  # stateless protocol
    fresh_builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    # lane 0: a brand-new client starting at its chunk 0; lane 1: the
    # migrated stream continuing at chunk N_CUT (per-lane chunk clocks)
    lane_gens = []
    for j in range(N_TOTAL - N_CUT - 1):
        segs0 = _chunk_segs(fresh_builder, j)
        segs1 = _chunk_segs(lane_builder, N_CUT + j)
        outs = ms.process_round(
            [segs0, segs1],
            vis_embeds=np.stack(
                [vis_rounds[j, 1], vis_rounds[N_CUT + j, 0]]
            ),
            grid_thw=GRID,
        )
        for b, (gen, _) in enumerate(outs):
            ms.engines[b].commit_assistant(gen, eb, (j if b == 0 else N_CUT + j))
        lane_gens.append(np.asarray(outs[1][0]).tolist())
    assert lane_gens == ctrl_all[N_CUT : N_TOTAL - 1]

    # migrate back out: lane 1 -> solo engine, run the final chunk
    snap2 = ms.snapshot_lane(1)
    solo2, s2b, _ = _fresh(params, scfg)
    solo2.restore(snap2)
    last = _drive(solo2, s2b, eb, N_TOTAL - 1, N_TOTAL, vis_rounds)
    assert last == ctrl_all[N_TOTAL - 1 :]
