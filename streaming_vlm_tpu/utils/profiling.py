"""Profiling: named-section wall timing + jax.profiler traces.

The reference instruments its serve loop with cuda-synchronized named sections
(PKV/CHECK/VIDEO/INPUT/GEN/POST, inference.py:208-210,312-329) and has no
deeper tracer. Here: the same section protocol with `block_until_ready`
fences, plus `trace()` wrapping jax.profiler for XPlane/TensorBoard dumps."""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


class SectionTimer:
    """Accumulate wall time per named section within one loop iteration."""

    def __init__(self, sections=("PKV", "CHECK", "VIDEO", "INPUT", "GEN", "POST")):
        self.names = tuple(sections)
        self.reset()

    def reset(self):
        self.acc: Dict[str, float] = {k: 0.0 for k in self.names}
        self._loop_start = time.perf_counter()

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        """`sync` is an optional callable fencing device work (e.g.
        lambda: jax.block_until_ready(x)) — the TPU analogue of the
        reference's torch.cuda.synchronize."""
        if sync:
            sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                sync()
            self.acc[name] = self.acc.get(name, 0.0) + time.perf_counter() - t0

    @property
    def total(self) -> float:
        return time.perf_counter() - self._loop_start

    def line(self, i: int) -> str:
        body = " | ".join(f"{k}={v:.3f}s" for k, v in self.acc.items())
        return f"[Loop {i}] total={self.total:.3f}s | {body}"

    def record(self) -> Dict[str, float]:
        d = dict(self.acc)
        d["total"] = self.total
        return d


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace -> TensorBoard XPlane dump under `logdir`
    (inspect with tensorboard_plugin_profile)."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class JsonlLogger:
    """Append-mode jsonl metric stream (the W&B-equivalent sink; reference
    reports to wandb/tensorboard, sft_stage_1.sh:22-26)."""

    def __init__(self, path: str):
        self.f = open(path, "a")

    def log(self, **kv):
        kv.setdefault("ts", time.time())
        self.f.write(json.dumps(kv) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()
