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
    from ..config import SamplingConfig
    from ..serve import streaming_inference

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
            skip_first_chunk=int(begin),
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
