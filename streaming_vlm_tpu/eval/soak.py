"""Soak test: constant-memory + flat per-token latency over long streams.

The headline property of the streaming KV policy (BASELINE.md: "sustain
real-time ingest with flat per-token latency over 1-hour streams"; reference
readme.md:11 "constant-size cache, stable latency on effectively infinite
video"). Runs N chunks, records KV occupancy and per-chunk latency, and
checks:
  * KV occupancy is exactly constant once the window is saturated
  * steady-state latency drift (least-squares slope) is below a threshold
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Dict, List, Optional

import numpy as np

from ..config import ModelConfig, SamplingConfig, StreamConfig


@dataclasses.dataclass
class SoakReport:
    n_chunks: int
    kv_occupancy: List[int]
    chunk_seconds: List[float]
    steady_start: int
    kv_constant: bool
    latency_slope_ms_per_chunk: float
    p50_ms: float
    p95_ms: float

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["kv_occupancy"] = d["kv_occupancy"][-8:]
        d["chunk_seconds"] = [round(x, 4) for x in d["chunk_seconds"][-8:]]
        return json.dumps(d)


def run_soak(
    *,
    cfg: ModelConfig,
    params,
    stream: StreamConfig,
    sampling: Optional[SamplingConfig] = None,
    n_chunks: int = 100,
    grid=(1, 8, 8),
    seed: int = 0,
    dtype=None,
    tokenizer=None,
) -> SoakReport:
    """Drive the engine with synthetic frames for n_chunks; measure."""
    import jax.numpy as jnp

    from ..streaming.engine import StreamingEngine
    from ..streaming.protocol import FakeTokenizer, PromptBuilder

    from ..models.qwen25_vl import model as _model

    sampling = sampling or SamplingConfig()
    adt = dtype or jnp.bfloat16
    engine = StreamingEngine(cfg, params, stream, sampling, dtype=adt)
    engine.prewarm()
    encode = tokenizer or FakeTokenizer(cfg.tokens)
    builder = PromptBuilder(cfg.tokens, encode)
    _, end_bias = builder.measure_biases()
    rng = np.random.default_rng(seed)

    merge = cfg.vision.spatial_merge_size
    n_vid = grid[0] * (grid[1] // merge) * (grid[2] // merge)
    spgt = 2.0 / stream.fps
    frame_h = grid[1] * cfg.vision.patch_size
    frame_w = grid[2] * cfg.vision.patch_size
    n_frames = grid[0] * cfg.vision.temporal_patch_size

    def synth_frames():
        return rng.integers(
            0, 255, size=(n_frames, frame_h, frame_w, 3), dtype=np.uint8
        )

    # pipelined serve protocol, identical to bench.py: dispatch chunk i's
    # step, then chunk i+1's encode, then block
    kv_occ, times = [], []
    vis = _model.encode_video_frames(
        cfg, params, engine.upload_frames(synth_frames()), grid, dtype=adt
    )
    for i in range(n_chunks):
        t0, t1 = i * stream.chunk_duration, (i + 1) * stream.chunk_duration
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments("soak"))
            segs.extend(
                builder.user_turn_segments(0, t0, t1, n_vid, grid, spgt, query="go")
            )
        else:
            segs.extend(builder.user_turn_segments(i, t0, t1, n_vid, grid, spgt))
        segs.extend(builder.assistant_open_segments(i))
        t_start = time.perf_counter()
        handle = engine.process_chunk_async(segs, vis_embeds=vis, grid_thw=grid)
        if i + 1 < n_chunks:
            vis = _model.encode_video_frames(
                cfg, params, engine.upload_frames(synth_frames()), grid, dtype=adt
            )
        gen, _ = engine.finish_chunk(handle)
        times.append(time.perf_counter() - t_start)
        engine.commit_assistant(gen, end_bias, i)
        kv_occ.append(engine.cached)

    # true steady state starts once BOTH the round windows AND the
    # previous-text sink/sliding-window region have filled (the latter grows
    # by ~(gen-len - tail) relocated tokens per round); use the last third of
    # the run, but no earlier than the round windows
    steady_start = max(
        max(stream.visual_round, stream.text_round) + 2, 2 * n_chunks // 3
    )
    steady_kv = kv_occ[steady_start:]
    steady_t = np.asarray(times[steady_start:])
    # KV occupancy varies only by generation-length jitter (<= max_new) plus
    # the slowly-growing digit count of the 'Time=a-bs' prompts (a property of
    # the reference protocol as well) — bounded, not byte-identical
    kv_constant = (
        len(steady_kv) > 0
        and max(steady_kv) - min(steady_kv)
        <= stream.max_tokens_per_chunk + 8 * stream.text_round // 4 + 8
    )
    if len(steady_t) >= 3:
        x = np.arange(len(steady_t))
        slope = float(np.polyfit(x, steady_t * 1000.0, 1)[0])
    else:
        slope = 0.0
    return SoakReport(
        n_chunks=n_chunks,
        kv_occupancy=kv_occ,
        chunk_seconds=times,
        steady_start=steady_start,
        kv_constant=kv_constant,
        latency_slope_ms_per_chunk=slope,
        p50_ms=float(np.median(steady_t) * 1000) if len(steady_t) else 0.0,
        p95_ms=float(np.percentile(steady_t, 95) * 1000) if len(steady_t) else 0.0,
    )
