"""Eval-harness tests: efficiency configs, Inf-Stream-Eval resume/merge/score,
OVO-Bench reformat + MCQ, LiveSports generate+judge — tiny model, native test
video, fake judge."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import StreamConfig, VideoConfig, qwen25_vl_tiny
from streaming_vlm_tpu.eval import infstream, livesports, ovobench
from streaming_vlm_tpu.eval.judge import judge_pair, tally
from streaming_vlm_tpu.eval.mcq import build_mcq_prompt_ids, option_token_ids
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer
from streaming_vlm_tpu.video import ingest

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
FTOK = FakeTokenizer(TOK)
TINY_VIDEO_CFG = VideoConfig(fps=2.0, video_min_pixels=28 * 28, video_max_pixels=16 * 28 * 28)
TINY_STREAM = StreamConfig(
    fps=2.0, chunk_duration=1.0, window_size=2, text_round=2,
    text_sink=4, text_sliding_window=4, max_tokens_per_chunk=4,
    kv_capacity=2048, prefill_buckets=(128, 256),
)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("evalv") / "clip.mp4")
    ingest.build_native()
    ingest.write_test_video(path, w=84, h=56, n_frames=80, fps=10)
    return path


@pytest.fixture(scope="module")
def params():
    return model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


def fake_judge(prefer: str = "A"):
    def call(system: str, user: str) -> str:
        return prefer

    return call


def test_judge_double_vote():
    ab, ba = judge_pair(fake_judge("A"), "ref", "ca", "cb")
    # AB says A; BA says A (raw) -> flipped to B -> split vote
    assert (ab, ba) == ("A", "B")
    assert tally(ab, ba)["winner"] == "equal"


def test_infstream_generate_resume_score(video_path, params, tmp_path):
    meta_path = str(tmp_path / "meta.jsonl")
    # word stream covering 8 s
    content = [[i * 0.5, i * 0.5 + 0.5, f"w{i}"] for i in range(16)]  # ends at 8.0
    with open(meta_path, "w") as f:
        f.write(json.dumps({"video": video_path, "content": content}) + "\n")

    out_a = str(tmp_path / "a.jsonl")
    for _ in range(2):  # second run must be a no-op (resume)
        infstream.generate_segments(
            cfg=CFG, params=params, tokenizer=FTOK,
            eval_metadata=meta_path, out_path=out_a,
            start_time=0, duration=4,
            stream=TINY_STREAM, video=TINY_VIDEO_CFG, dtype=jnp.float32,
        )
    lines = [json.loads(l) for l in open(out_a)]
    assert len(lines) == 2  # 8 s in two 4 s chunks, not duplicated on resume
    assert infstream.latest_end_time(out_a, os.path.basename(video_path)) == 8

    merged_a = str(tmp_path / "merged_a.jsonl")
    infstream.merge_results([out_a], merged_a)
    merged = [json.loads(l) for l in open(merged_a)]
    assert len(merged) == 1 and len(merged[0]["items"]) == 8

    scores_path = str(tmp_path / "scores.jsonl")
    results = infstream.score_segments(
        merged_a=merged_a, merged_b=merged_a, eval_metadata=meta_path,
        judge=fake_judge("A"), out_path=scores_path, seg_len=4,
    )
    assert len(results) == 2
    summary = infstream.merge_scores([scores_path])
    assert summary["total_windows"] == 2


def test_mcq_predict_batch_matches_one(params):
    """Batched MCQ scoring (one dispatch for B questions, the TPU answer to
    the reference's 8-GPU eval fan-out) == mcq_predict_one per element —
    mixed prompt lengths (right-pad), with and without per-question video."""
    from streaming_vlm_tpu.eval.mcq import mcq_predict_batch, mcq_predict_one

    grid = (1, 4, 4)
    n_vis = int(np.prod(grid)) // CFG.vision.spatial_merge_unit
    patch_dim = (
        CFG.vision.in_channels
        * CFG.vision.temporal_patch_size
        * CFG.vision.patch_size**2
    )
    rng = np.random.default_rng(12)
    questions = [
        "Is the ball red or blue or green?",
        "Short q?",
        "Which of the following describes the scene best given everything "
        "that happened so far in this very long question string?",
    ]
    opt_ids = option_token_ids(FTOK, ["A", "B", "C", "D"])
    ids_list = [
        build_mcq_prompt_ids(CFG, FTOK, q, n_vis) for q in questions
    ]
    assert len({len(i) for i in ids_list}) > 1  # genuinely mixed lengths

    # text-only prompts (no video region at all)
    ids_text = [build_mcq_prompt_ids(CFG, FTOK, q, 0) for q in questions]
    solo = [
        mcq_predict_one(CFG, params, ids, opt_ids) for ids in ids_text
    ]
    got = mcq_predict_batch(
        CFG, params, ids_text, [opt_ids] * len(ids_text)
    )
    assert got == solo

    # with per-question video through the vmapped tower
    patches = rng.normal(size=(len(ids_list), int(np.prod(grid)), patch_dim))
    patches = (patches * 0.1).astype(np.float32)
    solo_v = [
        mcq_predict_one(
            CFG, params, ids, opt_ids,
            pixel_patches=patches[b], video_grid_thw=np.asarray([grid]),
            second_per_grid_ts=np.asarray([1.0], np.float32),
        )
        for b, ids in enumerate(ids_list)
    ]
    got_v = mcq_predict_batch(
        CFG, params, ids_list, [opt_ids] * len(ids_list),
        pixel_patches=patches, video_grid_thw=grid,
        second_per_grid_ts=[1.0] * len(ids_list),
    )
    assert got_v == solo_v


def test_mcq_predict_batch_mixed_grids(params):
    """Mixed-grid batched MCQ (the real OVO-Bench shape: every question crops
    a different video span, so grids differ per question; one may be
    text-only) == mcq_predict_one per element. Vision counts pad to the
    round max (vis_bucket rounding) with OOB scatter-drop slots."""
    from streaming_vlm_tpu.eval.mcq import mcq_predict_batch, mcq_predict_one

    grids = [(1, 4, 4), (1, 6, 4), None]  # third question text-only
    patch_dim = (
        CFG.vision.in_channels
        * CFG.vision.temporal_patch_size
        * CFG.vision.patch_size**2
    )
    rng = np.random.default_rng(21)
    questions = [
        "Is the ball red or blue?",
        "Which event happened immediately after the whistle blew loudly?",
        "No video for this one?",
    ]
    opt_ids = option_token_ids(FTOK, ["A", "B", "C", "D"])
    ids_list, patches_list, spg_list = [], [], []
    for q, g in zip(questions, grids):
        if g is None:
            ids_list.append(build_mcq_prompt_ids(CFG, FTOK, q, 0))
            patches_list.append(None)
            spg_list.append(None)
        else:
            n_vis = int(np.prod(g)) // CFG.vision.spatial_merge_unit
            ids_list.append(build_mcq_prompt_ids(CFG, FTOK, q, n_vis))
            pat = rng.normal(size=(int(np.prod(g)), patch_dim))
            patches_list.append((pat * 0.1).astype(np.float32))
            spg_list.append(1.0)

    solo = [
        mcq_predict_one(
            CFG, params, ids, opt_ids,
            pixel_patches=patches_list[b],
            video_grid_thw=None if grids[b] is None else np.asarray([grids[b]]),
            second_per_grid_ts=(
                None if grids[b] is None
                else np.asarray([1.0], np.float32)
            ),
        )
        for b, ids in enumerate(ids_list)
    ]
    got = mcq_predict_batch(
        CFG, params, ids_list, [opt_ids] * len(ids_list),
        pixel_patches=patches_list, video_grid_thw=grids,
        second_per_grid_ts=spg_list, vis_bucket=8,
    )
    assert got == solo

    # all-text-only through the mixed entry falls back to the shared path
    ids_text = [build_mcq_prompt_ids(CFG, FTOK, q, 0) for q in questions]
    solo_t = [mcq_predict_one(CFG, params, i, opt_ids) for i in ids_text]
    got_t = mcq_predict_batch(
        CFG, params, ids_text, [opt_ids] * len(ids_text),
        pixel_patches=[None] * 3, video_grid_thw=[None] * 3,
    )
    assert got_t == solo_t


def test_ovobench_reformat_and_mcq(video_path, params, tmp_path):
    raw = [
        {"id": 1, "task": "CRR", "question": "Is it red?", "ask_time": 0,
         "video": video_path, "test_info": [{"realtime": 3.0, "type": 1}]},
        {"id": 2, "task": "REC", "activity": "jump", "video": video_path,
         "test_info": [{"realtime": 4.0, "count": 2}]},
        {"id": 3, "task": "SSR", "video": video_path,
         "test_info": [{"realtime": 2.0, "type": 0, "step": "stir"}]},
        {"id": 4, "task": "OCR", "question": "What letter?", "realtime": 3.0,
         "video": video_path, "options": ["x", "y"], "gt": 1},
    ]
    raw_path = str(tmp_path / "ovo.json")
    with open(raw_path, "w") as f:
        json.dump(raw, f)
    fmt_path = str(tmp_path / "ovo_mcq.jsonl")
    n = ovobench.transfer_annotations(raw_path, fmt_path)
    assert n == 4
    rows = [json.loads(l) for l in open(fmt_path)]
    assert rows[0]["answer"] == "Yes" and rows[0]["options"] == ["No", "Yes"]
    assert rows[1]["answer"] == "2"
    assert rows[3]["answer"] == "B" and "A. x" in rows[3]["question"]

    results = ovobench.evaluate_ovobench(
        cfg=CFG, params=params, encode=FTOK,
        benchmark_path=fmt_path, fps=2.0,
        video=TINY_VIDEO_CFG,
        out_path=str(tmp_path / "preds.jsonl"),
    )
    assert len(results) == 4
    ok = [r for r in results if "error" not in r]
    assert len(ok) == 4, results
    accs = ovobench.evaluate_results(results)
    assert "CRR" in accs or "avg_forward" in accs

    # batched (mixed-grid, mixed option counts: CRR/SSR 2, REC 11, OCR 2)
    # == sequential per element
    batched = ovobench.evaluate_ovobench(
        cfg=CFG, params=params, encode=FTOK,
        benchmark_path=fmt_path, fps=2.0,
        video=TINY_VIDEO_CFG, batch_size=3,
    )
    by_idx = {r["_idx"]: r for r in batched}
    assert len(by_idx) == 4 and all("error" not in r for r in batched)
    for r in results:
        assert by_idx[r["_idx"]]["response"] == r["response"], (r, by_idx[r["_idx"]])


def test_livesports_generate_and_judge(video_path, params, tmp_path):
    events = [
        {"event_id": "e1", "video": video_path, "begin": 0.0, "end": 3.0,
         "preasr_text": "pre words", "event_cc": "baseline text"},
        {"event_id": "e2", "video": video_path, "begin": 3.0, "end": 6.0,
         "preasr_text": "", "event_cc": "another baseline"},
    ]
    events_path = str(tmp_path / "events.jsonl")
    with open(events_path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    pred_dir = str(tmp_path / "preds")
    written = livesports.generate_commentary(
        cfg=CFG, params=params, tokenizer=FTOK,
        events_path=events_path, out_dir=pred_dir,
        stream=TINY_STREAM, video=TINY_VIDEO_CFG, dtype=jnp.float32,
    )
    assert len(written) == 2
    # idempotent
    assert livesports.generate_commentary(
        cfg=CFG, params=params, tokenizer=FTOK,
        events_path=events_path, out_dir=pred_dir,
        stream=TINY_STREAM, video=TINY_VIDEO_CFG, dtype=jnp.float32,
    ) == []
    def content_judge(system, user):
        # position-consistent fake: prefer the candidate containing 'baseline'
        a = user.split("Candidate A:\n")[1].split("\n\nCandidate B:")[0]
        return "A" if "baseline" in a else "B"

    summary = livesports.judge_events(
        events_path=events_path, pred_dir=pred_dir,
        judge=content_judge, out_path=str(tmp_path / "votes.jsonl"),
    )
    assert summary["total"] == 2
    assert summary["wins"]["B"] == 2  # baseline (candidate B) wins both votes
    assert summary["win_rate_excl_ties"] == 0.0


def test_soak_constant_kv_and_flat_latency(params):
    from streaming_vlm_tpu.eval.soak import run_soak

    stream = StreamConfig(
        fps=2.0, chunk_duration=1.0, window_size=3, text_round=3,
        text_sink=4, text_sliding_window=4, max_tokens_per_chunk=3,
        kv_capacity=1024, prefill_buckets=(128,),
    )
    report = run_soak(
        cfg=CFG, params=params, stream=stream, n_chunks=12, grid=(1, 4, 4),
        dtype=jnp.float32,
    )
    assert report.kv_constant, report.kv_occupancy
    assert report.p50_ms > 0


@pytest.mark.parametrize("mode", ["a", "b", "c", "d"])
def test_efficiency_configs_end_to_end(video_path, params, tmp_path, mode):
    from streaming_vlm_tpu.eval.efficiency import run_efficiency

    payload = run_efficiency(
        cfg=CFG, params=params, tokenizer=FTOK,
        video_path=video_path, baseline_mode=mode, duration=3.0,
        output_dir=str(tmp_path / "eff"),
        stream_overrides=dict(
            kv_capacity=2048, prefill_buckets=(128, 256, 512),
            max_tokens_per_chunk=3,
        ),
        video=TINY_VIDEO_CFG, dtype=jnp.float32,
    )
    assert payload["summary"]["num_chunks"] == 3
    assert payload["meta"]["recompute"] == (mode == "c")
    for rec in payload["per_chunk"]:
        assert rec["decoded_tokens"] >= 1
        assert rec["gen_time_per_token"] is not None


def test_livesports_competitor_generators(video_path, params, tmp_path):
    """LiveCC + plain-caption competitors over the same events, merged to
    jsonl, then a streaming-vs-LiveCC head-to-head through the judge
    (reference distributed_generate_livecc.py / _caption.py)."""
    from streaming_vlm_tpu.baselines.livecc import LiveCCConfig

    events = [
        {"event_id": "e1", "video": video_path, "begin": 0.0, "end": 3.0,
         "preasr_text": "pre words", "event_cc": "baseline text",
         "title": "Match"},
    ]
    events_path = str(tmp_path / "events.jsonl")
    with open(events_path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    # prompt building follows the reference's two modes
    p = livesports.competitor_prompt(events[0])
    assert 'titled "Match"' in p and "previous commentary" in p
    assert livesports.competitor_prompt(events[0], simple_ctx=True) == "pre words"

    lc_dir = str(tmp_path / "livecc")
    lc = LiveCCConfig(fps=2.0, initial_fps_frames=2, streaming_fps_frames=2,
                      max_new_tokens=4, kv_capacity=2048)
    written = livesports.generate_livecc_commentary(
        cfg=CFG, params=params, tokenizer=FTOK, events_path=events_path,
        out_dir=lc_dir, lc=lc, video=TINY_VIDEO_CFG, dtype=jnp.float32,
    )
    assert len(written) == 1
    with open(written[0]) as f:
        rec = json.load(f)
    assert rec["pred"].endswith("...") and rec["event_id"] == "e1"
    # idempotent
    assert livesports.generate_livecc_commentary(
        cfg=CFG, params=params, tokenizer=FTOK, events_path=events_path,
        out_dir=lc_dir, lc=lc, video=TINY_VIDEO_CFG, dtype=jnp.float32,
    ) == []

    cap_dir = str(tmp_path / "caption")
    written = livesports.generate_plain_captions(
        cfg=CFG, params=params, tokenizer=FTOK, events_path=events_path,
        out_dir=cap_dir, fps=1.0, max_frames=4, max_new_tokens=4,
        video=TINY_VIDEO_CFG,
    )
    assert len(written) == 1

    merged = str(tmp_path / "livecc.jsonl")
    assert livesports.merge_event_outputs(lc_dir, merged) == 1

    summary = livesports.judge_competitors(
        events_path=events_path, pred_dir_a=lc_dir, pred_dir_b=cap_dir,
        judge=fake_judge("A"), out_path=str(tmp_path / "votes.jsonl"),
    )
    assert summary["total"] == 1
