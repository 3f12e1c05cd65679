"""LiveSports-3K-CC harness: per-event streaming commentary + LLM-judge win
rate vs baseline captions.

Parity targets: /root/reference/eval/livesports3kcc/
  * distributed_generate_streaming.py — one replica per worker, events
    round-robin by index (:60-66,:125-155), preasr_text as previous-text
    context (:100-110), per-event output files skipped when present (:68-70)
  * llm_judge.py — A/B + B/A double vote vs baseline -> win rate (:30-126)

The dataset (HF stdKonjac/LiveSports-3K) is supplied as a local jsonl with
fields: event_id, video (path), begin, end, preasr_text, event_cc (ground
commentary / baseline candidate), title.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from .judge import JudgeFn, judge_pair, tally
from .mcq import shard_indices


def load_events(path: str) -> List[Dict]:
    with open(path) as f:
        return [json.loads(l) for l in f]


def generate_commentary(
    *,
    cfg,
    params,
    tokenizer,
    events_path: str,
    out_dir: str,
    worker: int = 0,
    num_workers: int = 1,
    temperature: float = 0.9,
    stream=None,
    video=None,
    query: str = "Commentate on this match",
    dtype=None,
) -> List[str]:
    """Generate streaming commentary per event; idempotent per-event files."""
    from ..config import SamplingConfig, StreamConfig
    from ..serve import streaming_inference

    stream = stream or StreamConfig()
    events = load_events(events_path)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for idx in shard_indices(len(events), worker, num_workers):
        ev = events[idx]
        out_path = os.path.join(out_dir, f"{ev['event_id']}.json")
        if os.path.exists(out_path):
            continue
        begin, end = float(ev["begin"]), float(ev["end"])
        responses = streaming_inference(
            cfg=cfg,
            params=params,
            tokenizer=tokenizer,
            video_path=ev["video"],
            stream=stream,
            sampling=SamplingConfig(temperature=temperature),
            video=video,
            previous_text=ev.get("preasr_text", ""),
            query=query,
            duration=end - begin,
            # float chunk offset: start_time = (i + skip) * chunk_duration
            # must equal begin + i*cd EXACTLY — int(begin) shifted the
            # window back by the fractional second and dropped the event
            # tail (the LiveCC competitor at :213 gets the float begin,
            # which biased the head-to-head judge)
            skip_first_chunk=begin / stream.chunk_duration,
            quiet=True,
            dtype=dtype,
        )
        pred = " ".join(r["response"].strip() for r in responses).strip()
        with open(out_path, "w") as f:
            json.dump(
                {
                    "event_id": ev["event_id"],
                    "pred": pred,
                    "items": responses,
                    "begin": begin,
                    "end": end,
                },
                f,
                ensure_ascii=False,
            )
        written.append(out_path)
    return written


def judge_events(
    *,
    events_path: str,
    pred_dir: str,
    judge: JudgeFn,
    out_path: str,
    baseline_field: str = "event_cc",
) -> Dict[str, float]:
    """A = our prediction, B = baseline caption; double-vote win rate."""
    events = load_events(events_path)
    wins = {"A": 0, "B": 0, "equal": 0}
    with open(out_path, "w") as fout:
        for ev in events:
            p = os.path.join(pred_dir, f"{ev['event_id']}.json")
            if not os.path.exists(p):
                continue
            with open(p) as f:
                pred = json.load(f)["pred"]
            ref = ev.get("preasr_text", "")
            ab, ba = judge_pair(judge, ref, pred, ev[baseline_field])
            rec = {"event_id": ev["event_id"], **tally(ab, ba)}
            wins[rec["winner"]] += 1
            fout.write(json.dumps(rec, ensure_ascii=False) + "\n")
    total = sum(wins.values())
    decided = wins["A"] + wins["B"]
    return {
        "total": total,
        "wins": wins,
        "win_rate": wins["A"] / total if total else 0.0,
        "win_rate_excl_ties": wins["A"] / decided if decided else 0.0,
    }


# ---------------------------------------------------------------------------
# Competitor generators (reference eval/livesports3kcc/
# distributed_generate_livecc.py and distributed_generate_caption.py): the
# win-rate comparison needs LiveCC-style interleaved commentary and a plain
# offline caption from the same events.
# ---------------------------------------------------------------------------


def competitor_prompt(ev: Dict, simple_ctx: bool = False) -> str:
    """The generators' shared context prompt (protocol constant — must match
    the reference wording for judge comparability,
    distributed_generate_livecc.py:70-84)."""
    title = ev.get("title", "") or ev.get("event_title", "")
    preasr = ev.get("preasr_text", "")
    if simple_ctx:  # non-instruct models: bare title-or-preasr context
        title = "" if preasr else title
        return f"{title}\n{preasr}".strip()
    p = (
        "You are an expert video commentator providing real-time, insightful, "
        "and engaging commentary on visual content.\n"
    )
    if title:
        p += f'This is a video titled "{title}".\n'
    if preasr:
        p += f"Here is previous commentary of the video:\n\n{preasr}\n\n"
        p += "Please continue to comment the video."
    return p


def _decode_text(tokenizer, ids) -> str:
    if hasattr(tokenizer, "decode"):
        return tokenizer.decode([int(t) for t in ids], skip_special_tokens=True)
    return " ".join(str(int(t)) for t in ids)


def _encode_fn(tokenizer):
    if hasattr(tokenizer, "convert_tokens_to_ids"):
        from ..streaming.protocol import hf_encode_fn

        return hf_encode_fn(tokenizer)
    return tokenizer


def generate_livecc_commentary(
    *,
    cfg,
    params,
    tokenizer,
    events_path: str,
    out_dir: str,
    worker: int = 0,
    num_workers: int = 1,
    lc=None,  # baselines.livecc.LiveCCConfig
    video=None,  # VideoConfig for pixel budgets
    simple_ctx: bool = False,
    dtype=None,
) -> List[str]:
    """LiveCC competitor: interleaved per-clip commentary with carried KV over
    each event window, ' ...' segments joined like the reference
    (distributed_generate_livecc.py:86-97). Idempotent per-event files."""
    import numpy as np

    from ..baselines.livecc import LiveCCConfig, LiveCCInfer
    from ..config import VideoConfig
    from ..video.ingest import ChunkedVideoSource, select_chunk_frames

    lc = lc or LiveCCConfig()
    video = video or VideoConfig(fps=lc.fps)
    events = load_events(events_path)
    os.makedirs(out_dir, exist_ok=True)
    tps = cfg.vision.temporal_patch_size
    ps = cfg.vision.patch_size
    written = []
    for idx in shard_indices(len(events), worker, num_workers):
        ev = events[idx]
        out_path = os.path.join(out_dir, f"{ev['event_id']}.json")
        if os.path.exists(out_path):
            continue
        begin, end = float(ev["begin"]), float(ev["end"])
        infer = LiveCCInfer(
            cfg, params, _encode_fn(tokenizer), lc, dtype=dtype,
            query=competitor_prompt(ev, simple_ctx),
        )
        src = ChunkedVideoSource(
            ev["video"], fps=lc.fps,
            max_pixels=video.video_max_pixels, min_pixels=video.video_min_pixels,
            patch_size=ps, temporal_patch_size=tps,
            merge_size=cfg.vision.spatial_merge_size,
        )
        idxs, _ = select_chunk_frames(
            src.reader.frame_ts[:, 1], begin, end, fps=lc.fps, frame_factor=tps
        )
        frames = src.reader.fetch(idxs, src.out_w, src.out_h)
        clips = [frames[: lc.initial_fps_frames]] + [
            frames[j : j + lc.streaming_fps_frames]
            for j in range(lc.initial_fps_frames, len(frames), lc.streaming_fps_frames)
        ]
        texts = []
        for clip in clips:
            if not len(clip):
                continue
            pad = (-len(clip)) % tps
            if pad:
                clip = np.concatenate([clip, np.repeat(clip[-1:], pad, 0)])
            grid = (len(clip) // tps, clip.shape[1] // ps, clip.shape[2] // ps)
            gen = infer.commentate(clip, grid)
            texts.append(_decode_text(tokenizer, gen))
        overall = (
            " ".join(t.replace(" ...", "") for t in texts if t).strip() + "..."
        )
        with open(out_path, "w") as f:
            json.dump(
                {"event_id": ev["event_id"], "pred": overall,
                 "begin": begin, "end": end},
                f, ensure_ascii=False,
            )
        written.append(out_path)
    return written


def generate_plain_captions(
    *,
    cfg,
    params,
    tokenizer,
    events_path: str,
    out_dir: str,
    worker: int = 0,
    num_workers: int = 1,
    fps: float = 1.0,
    max_frames: int = 8,
    max_new_tokens: int = 128,
    video=None,
    dtype=None,
) -> List[str]:
    """Plain-caption competitor: one offline full-attention generation per
    event (reference distributed_generate_caption.py:80-104 — a stock
    generate over the whole clip, no streaming)."""
    from ..serve import caption_clip

    events = load_events(events_path)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for idx in shard_indices(len(events), worker, num_workers):
        ev = events[idx]
        out_path = os.path.join(out_dir, f"{ev['event_id']}.json")
        if os.path.exists(out_path):
            continue
        caption = caption_clip(
            cfg=cfg, params=params, tokenizer=tokenizer,
            video_path=ev["video"], query=competitor_prompt(ev),
            fps=fps, max_frames=max_frames, max_new_tokens=max_new_tokens,
            video=video,
        )
        with open(out_path, "w") as f:
            json.dump(
                {"event_id": ev["event_id"], "pred": caption,
                 "begin": float(ev["begin"]), "end": float(ev["end"])},
                f, ensure_ascii=False,
            )
        written.append(out_path)
    return written


def merge_event_outputs(out_dir: str, jsonl_path: str) -> int:
    """Merge per-event json files into one jsonl (reference
    distributed_generate_livecc.py:127-135)."""
    n = 0
    with open(jsonl_path, "w") as wf:
        for name in sorted(os.listdir(out_dir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(out_dir, name)) as f:
                wf.write(json.dumps(json.load(f), ensure_ascii=False) + "\n")
            n += 1
    return n


def judge_competitors(
    *,
    events_path: str,
    pred_dir_a: str,
    pred_dir_b: str,
    judge: JudgeFn,
    out_path: str,
) -> Dict[str, float]:
    """Judge two generator outputs head-to-head (e.g. streaming vs LiveCC),
    double-vote win rate like judge_events."""
    events = load_events(events_path)
    wins = {"A": 0, "B": 0, "equal": 0}
    with open(out_path, "w") as fout:
        for ev in events:
            pa = os.path.join(pred_dir_a, f"{ev['event_id']}.json")
            pb = os.path.join(pred_dir_b, f"{ev['event_id']}.json")
            if not (os.path.exists(pa) and os.path.exists(pb)):
                continue
            with open(pa) as f:
                a = json.load(f)["pred"]
            with open(pb) as f:
                b = json.load(f)["pred"]
            ab, ba = judge_pair(judge, ev.get("preasr_text", ""), a, b)
            rec = {"event_id": ev["event_id"], **tally(ab, ba)}
            wins[rec["winner"]] += 1
            fout.write(json.dumps(rec, ensure_ascii=False) + "\n")
    total = sum(wins.values())
    decided = wins["A"] + wins["B"]
    return {
        "total": total,
        "wins": wins,
        "win_rate": wins["A"] / total if total else 0.0,
        "win_rate_excl_ties": wins["A"] / decided if decided else 0.0,
    }
