"""Streaming serve loop: the reference's streaming_inference
(/root/reference/src/streaming_vlm/inference/inference.py:181-522) rebuilt on
the TPU engine.

Per chunk: evict -> read+patchify video chunk (native C++ pipeline, prefetched
asynchronously so the copy/decode overlap device compute) -> prompt assembly
(Time=a-bs protocol) -> fused prefill+decode on device -> decode text ->
WebVTT / NDJSON output, with the reference's PKV/VIDEO/INPUT/GEN/POST section
timing (inference.py:312-329,495-507).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from .config import ModelConfig, SamplingConfig, StreamConfig, VideoConfig
from .streaming.engine import StreamingEngine
from .streaming.protocol import PromptBuilder

DEFAULT_QUERY = "Commentate on this match"


@dataclasses.dataclass
class ChunkResult:
    response: str
    start_time: float
    end_time: float
    gen_time_sec: float
    decoded_tokens: int
    section_time: Dict[str, float]


class StreamingSession:
    """One live stream: engine + protocol + output sinks."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Any,
        tokenizer,  # HF tokenizer or compatible (encode via __call__, decode())
        *,
        stream: Optional[StreamConfig] = None,
        sampling: Optional[SamplingConfig] = None,
        previous_text: str = "",
        query: str = DEFAULT_QUERY,
        recompute: bool = False,
        spec_decode: bool = False,  # speculative decoding (n-gram draft)
        spec_k: int = 7,
        dtype=None,
    ):
        import jax.numpy as jnp

        self.cfg = cfg
        self.stream = stream or StreamConfig()
        self.sampling = sampling or SamplingConfig()
        self.tokenizer = tokenizer
        self.engine = StreamingEngine(
            cfg, params, self.stream, self.sampling, dtype=dtype or jnp.bfloat16
        )
        self.spec_decode = spec_decode
        self.spec_k = spec_k
        self._draft = None
        if spec_decode:
            from .streaming.specdecode import NGramDraft

            self._draft = NGramDraft(n=2)
        if hasattr(tokenizer, "convert_tokens_to_ids"):  # HF tokenizer
            from .streaming.protocol import hf_encode_fn

            encode = hf_encode_fn(tokenizer)
        else:  # any callable text -> List[int] (e.g. FakeTokenizer)
            encode = tokenizer
        self.builder = PromptBuilder(cfg.tokens, encode)
        self.start_bias, self.end_bias = self.builder.measure_biases()
        self.previous_text = previous_text
        self.query = query
        self.recompute = recompute
        self._recent_videos: List = []  # (pixel_patches, grid) for recompute mode

    def snapshot(self):
        """Serialize the live stream (streaming/snapshot.py): KV prefix +
        segment table + accounting + rng. Resume in any process with
        `session.restore(snap)` and continue at `session.engine.chunk_index`.
        The n-gram draft's statistics are not snapshotted (they affect
        spec-decode speed, never tokens)."""
        assert not self.recompute, (
            "snapshot does not capture recompute mode's per-window pixel "
            "buffer (_recent_videos) — a restored recompute stream could "
            "not rebuild the surviving window's embeddings"
        )
        return self.engine.snapshot()

    def restore(self, snap) -> None:
        assert not self.recompute, "see snapshot(): recompute not supported"
        self.engine.restore(snap)

    def _decode_text(self, ids: np.ndarray) -> str:
        if hasattr(self.tokenizer, "decode"):
            return self.tokenizer.decode(
                [int(t) for t in ids], skip_special_tokens=True
            )
        return " ".join(str(int(t)) for t in ids)

    def encode_patches(self, pixel_patches, grid_thw):
        """Dispatch the vision encode of a chunk (async device work) — call
        for chunk i+1 right after run_chunk_async(i) so the encode rides the
        device queue behind chunk i's step (encoder/decoder overlap)."""
        import jax.numpy as jnp

        from .models.qwen25_vl import model as _model

        return _model.encode_video(
            self.cfg,
            self.engine.params,
            jnp.asarray(pixel_patches, self.engine.dtype),
            (tuple(int(x) for x in grid_thw),),
        )

    def run_chunk(
        self,
        i: int,
        start_time: float,
        *,
        frames_u8=None,
        grid_thw=None,
        pixel_patches=None,
        vis_embeds=None,
        forced_response_ids: Optional[np.ndarray] = None,
        question: str = "",
        timer=None,  # utils.profiling.SectionTimer
    ) -> Tuple[str, np.ndarray]:
        """Ingest chunk i and generate. Returns (response text, generated ids).
        `question` is a mid-stream qa_stream injection appended to the Time
        text (reference lmm_dataset.py:227-237)."""
        if self.spec_decode:
            assert not self.recompute, "spec decode + recompute not supported"
            segs = self._build_segs(i, start_time, grid_thw, question)
            gen, _ = self.engine.process_chunk_spec(
                segs,
                pixel_patches=pixel_patches,
                grid_thw=tuple(int(x) for x in grid_thw),
                frames_u8=frames_u8,
                vis_embeds=vis_embeds,
                draft_fn=self._draft,
                k_draft=self.spec_k,
                timer=timer,
            )
            if forced_response_ids is not None:
                # spec commits KV inline; GT forcing rolls it back like AR
                self.engine.rollback_generation(len(gen))
                gen = np.asarray(forced_response_ids, np.int32)
                self.engine.append_uncached(gen)
            if self._draft is not None:
                self._draft.observe(gen)
            self.engine.commit_assistant(gen, self.end_bias, i)
            return self._decode_text(gen), gen
        handle = self.run_chunk_async(
            i,
            start_time,
            frames_u8=frames_u8,
            grid_thw=grid_thw,
            pixel_patches=pixel_patches,
            vis_embeds=vis_embeds,
            question=question,
            timer=timer,
        )
        return self.finish_chunk(i, handle, forced_response_ids=forced_response_ids)

    def _build_segs(self, i: int, start_time: float, grid_thw, question: str = ""):
        """Per-round prompt segments (reference inference.py:370-388)."""
        from .streaming.protocol import build_round_segs

        return build_round_segs(
            self.builder, self.stream, self.cfg.vision.spatial_merge_size,
            i, start_time, grid_thw,
            query=self.query, previous_text=self.previous_text,
            question=question,
        )

    def run_chunk_async(
        self,
        i: int,
        start_time: float,
        *,
        frames_u8=None,
        grid_thw=None,
        pixel_patches=None,
        vis_embeds=None,
        question: str = "",
        timer=None,
    ):
        """Dispatch chunk i (evict + prompt + fused step); returns the engine
        handle for finish_chunk."""
        import contextlib

        def sec(name):
            return timer.section(name) if timer else contextlib.nullcontext()

        with sec("INPUT"):
            segs = self._build_segs(i, start_time, grid_thw, question)

        if self.recompute:
            # config (c): drop the cache, re-encode and re-prefill the whole
            # surviving window each chunk (reference inference.py:423-438)
            import jax.numpy as jnp

            from .models.qwen25_vl import model as _model

            with sec("GEN"):
                self._recent_videos.append(
                    (pixel_patches, tuple(int(x) for x in grid_thw))
                )
                keep = self.stream.visual_round
                self._recent_videos = self._recent_videos[-keep:]
                parts = [
                    _model.encode_video(
                        self.cfg, self.engine.params, jnp.asarray(p, self.engine.dtype), (g,)
                    )
                    for p, g in self._recent_videos
                ]
                vis_embeds = jnp.concatenate(parts, axis=0)
            pixel_patches = None
            frames_u8 = None

        return self.engine.process_chunk_async(
            segs,
            pixel_patches=pixel_patches,
            grid_thw=tuple(int(x) for x in grid_thw),
            frames_u8=frames_u8,
            vis_embeds=vis_embeds,
            recompute=self.recompute,
            timer=timer,
        )

    def finish_chunk(
        self,
        i: int,
        handle,
        *,
        forced_response_ids: Optional[np.ndarray] = None,
    ) -> Tuple[str, np.ndarray]:
        """Block for chunk i's generation, apply GT forcing, commit the
        assistant turn. Returns (response text, generated ids)."""
        gen, _ = self.engine.finish_chunk(handle)
        if forced_response_ids is not None:
            # ground-truth teacher forcing (reference inference.py:483-487):
            # replace the generated turn with the GT ids; their KV re-prefills
            # with the next chunk
            self.engine.rollback_generation(len(gen))
            gen = np.asarray(forced_response_ids, np.int32)
            self.engine.append_uncached(gen)
        self.engine.commit_assistant(gen, self.end_bias, i)
        response = self._decode_text(gen)
        return response, gen


def streaming_inference(
    *,
    cfg: ModelConfig,
    params: Any,
    tokenizer,
    video_path: str,
    output_dir: Optional[str] = None,
    stream: Optional[StreamConfig] = None,
    sampling: Optional[SamplingConfig] = None,
    video: Optional[VideoConfig] = None,
    previous_text: str = "",
    query: str = DEFAULT_QUERY,
    duration: Optional[float] = None,
    # in CHUNKS; fractional values start mid-chunk-grid (e.g. a LiveSports
    # event beginning at 12.7 s with 1 s chunks passes 12.7)
    skip_first_chunk: float = 0,
    quiet: bool = False,
    emit_json: bool = False,
    time_test: bool = False,
    gt_lookup: Optional[Dict[str, str]] = None,
    recompute: bool = False,
    spec_decode: bool = False,
    resume_snapshot: Optional[Dict] = None,  # streaming/snapshot.py dict
    trace_dir: Optional[str] = None,  # jax.profiler XPlane dump directory
    dtype=None,
):
    """Chunked streaming inference over a video file. Returns the list of
    per-chunk responses, plus per-chunk section timings when time_test=True
    (returning BOTH, fixing the reference's efficiency-harness drift at
    eval/efficiency/efficiency_test.py:74 vs inference.py:520).

    `resume_snapshot` (from StreamingSession.snapshot() or
    snapshot.load_snapshot) continues an interrupted run of the SAME
    video/config from its chunk_index — fault recovery for long streams;
    the VTT appends and the returned lists cover only the resumed chunks.

    `trace_dir` captures the whole run as a jax.profiler trace (TensorBoard
    XPlane under trace_dir; the deep-tracing layer the reference lacks —
    its only instrumentation is the wall-clock sections, inference.py:
    312-329, which we also keep)."""
    if trace_dir is not None:
        kw = {k: v for k, v in locals().items() if k != "trace_dir"}
        from .utils.profiling import trace

        with trace(trace_dir):
            return streaming_inference(trace_dir=None, **kw)
    from .utils.vtt import open_vtt, sec2ts
    from .video.ingest import ChunkedVideoSource

    stream = stream or StreamConfig()
    video = video or VideoConfig(fps=stream.fps)

    session = StreamingSession(
        cfg,
        params,
        tokenizer,
        stream=stream,
        sampling=sampling,
        previous_text=previous_text,
        query=query,
        recompute=recompute,
        spec_decode=spec_decode,
        dtype=dtype,
    )

    src = ChunkedVideoSource(
        video_path,
        fps=stream.fps,
        max_pixels=video.max_pixels_for_window(stream.window_size),
        min_pixels=video.video_min_pixels,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )

    total = duration if duration is not None else src.duration
    num_chunks = int(
        (total + stream.chunk_duration - 1) // stream.chunk_duration
    )

    i_start = 0
    if resume_snapshot is not None:
        session.restore(resume_snapshot)
        i_start = session.engine.chunk_index

    if output_dir is not None:
        if os.path.exists(output_dir) and i_start == 0:
            os.remove(output_dir)
        with open_vtt(output_dir):
            pass

    responses: List[Dict] = []
    time_results: List[Dict[str, float]] = []

    def read_chunk(i: int):
        s = (i + skip_first_chunk) * stream.chunk_duration
        return src.read_chunk(s, s + stream.chunk_duration)

    # the C++ decode of chunk i+1 overlaps the device compute of chunk i
    # (the encoder/decoder overlap north star, host side)
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    pending = pool.submit(read_chunk, i_start) if num_chunks > i_start else None

    from .utils.profiling import SectionTimer

    timer = SectionTimer()
    # Pipelined serve (encoder/decoder overlap): chunk i's fused step is
    # dispatched, then chunk i+1's vision encode is dispatched behind it, and
    # only then does the host block on chunk i's result — the device never
    # idles while the host decodes text / writes VTT / assembles prompts.
    # Recompute mode (efficiency config c) re-encodes whole windows per chunk
    # and keeps the simple synchronous path.
    #
    # SECTION-TIMING SEMANTICS UNDER PIPELINING (vs reference
    # inference.py:312-329): chunk i's GEN section closes in finish_chunk,
    # AFTER the host has also read chunk i+1's video and dispatched its
    # encode — so GEN includes that overlap window (it is wall-clock until
    # chunk i's tokens materialise, which is what real-time streaming
    # cares about), while VIDEO covers only the host-blocking part of the
    # read. Per-section numbers therefore sum to the loop total but split
    # differently from the reference's strictly-serial fences; for
    # reference-semantics sections, run with recompute=True (synchronous)
    # or use bench.py's per-chunk wall times.
    next_embeds = None
    next_video = None  # (patches, grid) already read for the NEXT chunk
    for i in range(i_start, num_chunks):
        timer.reset()
        start_time = (i + skip_first_chunk) * stream.chunk_duration

        with timer.section("VIDEO"):
            try:
                patches, grid, _pts = next_video or pending.result()
            except Exception as e:
                print(f"Error reading chunk {i}: {e}", file=sys.stderr)
                break
            if next_video is None and i + 1 < num_chunks:
                pending = pool.submit(read_chunk, i + 1)
            next_video = None

        with timer.section("CHECK"):
            forced = None
            if gt_lookup is not None:
                key = f"Time={start_time:.1f}-{start_time + stream.chunk_duration:.1f}s"
                if key in gt_lookup:
                    forced_text = gt_lookup[key] + "<|im_end|>"
                    forced = np.asarray(
                        session.builder.encode(forced_text), np.int32
                    )

        if spec_decode:
            # spec rounds are host-sequential; run the synchronous path
            # (video read prefetch still overlaps via the pool)
            response, gen = session.run_chunk(
                i, start_time,
                pixel_patches=None if next_embeds is not None else patches,
                vis_embeds=next_embeds, grid_thw=grid, timer=timer,
                forced_response_ids=forced,
            )
            next_embeds = None
        else:
            handle = session.run_chunk_async(
                i, start_time,
                pixel_patches=None if next_embeds is not None else patches,
                vis_embeds=next_embeds, grid_thw=grid, timer=timer,
            )
            next_embeds = None
        if not spec_decode and not recompute and i + 1 < num_chunks:
            # overlap: encode chunk i+1 while chunk i's step runs
            try:
                nxt = pending.result()
                pending = (
                    pool.submit(read_chunk, i + 2) if i + 2 < num_chunks else None
                )
                next_video = nxt
            except Exception:
                # the read itself failed: pending still holds the failed
                # future, so the next iteration's VIDEO read re-raises it
                next_video = None
            else:
                try:
                    next_embeds = session.encode_patches(nxt[0], nxt[1])
                except Exception:
                    # encode failed (e.g. transient device fault) AFTER
                    # pending was re-armed for chunk i+2 — KEEP the frames:
                    # the next chunk re-encodes them inside its own step
                    # dispatch (pixel_patches path). Dropping them here
                    # would silently pair chunk i+2's frames with chunk
                    # i+1's timestamps for the rest of the stream.
                    next_embeds = None
        if not spec_decode:
            response, gen = session.finish_chunk(
                i, handle, forced_response_ids=forced
            )

        with timer.section("POST"):
            clean = response[:-4] if response.endswith(" ...") else response
            responses.append(
                {
                    "response": clean,
                    "start_time": start_time,
                    "end_time": start_time + stream.chunk_duration,
                }
            )

        section = dict(timer.acc)
        loop_total = timer.total
        if not quiet:
            hms0 = time.strftime("%H:%M:%S", time.gmtime(int(start_time)))
            hms1 = time.strftime(
                "%H:%M:%S", time.gmtime(int(start_time + stream.chunk_duration))
            )
            print(
                f"Time={hms0}-{hms1}: {response}  | kv={session.engine.cached}",
                flush=True,
            )
            print(
                f"[Loop {i}] total={loop_total:.3f}s | "
                + " | ".join(f"{k}={v:.3f}s" for k, v in section.items()),
                flush=True,
            )
        if emit_json:
            sys.stdout.write(
                json.dumps(
                    {
                        "type": "segment",
                        "start": float(start_time),
                        "end": float(start_time + stream.chunk_duration),
                        "text": clean,
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )
            sys.stdout.flush()
        if time_test:
            section["gen_time_sec"] = loop_total
            section["decoded_tokens"] = int(len(gen))
            time_results.append(section)
        if output_dir is not None:
            with open_vtt(output_dir) as vf:
                vf.write(
                    f"{sec2ts(start_time)} --> {sec2ts(start_time + stream.chunk_duration)}\n"
                    f" Infer Time: {loop_total:.3f}s\n {response}\n\n"
                )

    if time_test:
        return responses, time_results
    return responses


def caption_clip(
    *,
    cfg: ModelConfig,
    params: Any,
    tokenizer,
    video_path: str,
    query: str = "Please describe the video.",
    fps: float = 1.0,
    max_frames: int = 8,
    max_new_tokens: int = 128,
    video: Optional[VideoConfig] = None,
    greedy: bool = True,
) -> str:
    """Offline full-attention captioning of a short clip (BASELINE config 1):
    read frames at `fps`, one full-attention forward per generated token."""
    import jax.numpy as jnp

    from .models.qwen25_vl import model as m
    from .streaming.protocol import hf_encode_fn
    from .video.ingest import ChunkedVideoSource, patchify_frames, select_chunk_frames

    v = video or VideoConfig(fps=fps)
    src = ChunkedVideoSource(
        video_path,
        fps=fps,
        max_pixels=v.video_max_pixels,
        min_pixels=v.video_min_pixels,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )
    idxs, _ = select_chunk_frames(
        src.reader.frame_ts[:, 1], None, None, fps=fps,
        frame_factor=cfg.vision.temporal_patch_size, max_frames=max_frames,
    )
    frames = src.reader.fetch(idxs[:max_frames], src.out_w, src.out_h)
    patches, grid = patchify_frames(
        frames,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )
    n_vid = patches.shape[0] // cfg.vision.spatial_merge_unit

    encode = (
        hf_encode_fn(tokenizer)
        if hasattr(tokenizer, "convert_tokens_to_ids")
        else tokenizer
    )
    prompt = (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        f"<|im_start|>user\n<|vision_start|>{'<|video_pad|>' * n_vid}<|vision_end|>"
        f"{query}<|im_end|>\n<|im_start|>assistant\n"
    )
    ids = np.asarray(encode(prompt), np.int32)
    out: List[int] = []
    for _ in range(max_new_tokens):
        logits = np.asarray(
            m.forward_full(
                cfg,
                params,
                ids,
                pixel_patches=jnp.asarray(patches),
                video_grid_thw=np.array([list(grid)]),
                second_per_grid_ts=[2.0 / fps],
            )
        )[-1]
        nxt = int(np.argmax(logits))
        if nxt == cfg.tokens.im_end:
            break
        out.append(nxt)
        ids = np.concatenate([ids, [nxt]]).astype(np.int32)
    if hasattr(tokenizer, "decode"):
        return tokenizer.decode(out, skip_special_tokens=True)
    return " ".join(str(t) for t in out)


def streaming_inference_from_dataset(
    *,
    cfg: ModelConfig,
    params: Any,
    tokenizer,
    dataset,  # data.dataset.StreamDataset
    index: int,
    stream: Optional[StreamConfig] = None,
    sampling: Optional[SamplingConfig] = None,
    query: str = DEFAULT_QUERY,
    use_gt: bool = False,
    quiet: bool = True,
    dtype=None,
) -> Tuple[List[Dict], List[Dict]]:
    """Dataset-driven streaming inference (the reference's test_data_json mode,
    inference.py:244-254,333-338): chunks come from the dataset's synthesized
    turns; with use_gt=True each decoded round is replaced by the ground-truth
    text (teacher forcing) so cache-policy correctness is isolated from
    sampling drift."""
    from .video.ingest import patchify_frames

    stream = stream or StreamConfig()
    session = StreamingSession(
        cfg, params, tokenizer, stream=stream, sampling=sampling, query=query, dtype=dtype
    )
    turns, all_frames, previous_text, _ = dataset.get_stream(index)
    session.previous_text = previous_text

    responses: List[Dict] = []
    ground_truths: List[Dict] = []
    for i, turn in enumerate(turns):
        frames = all_frames[turn.frame_indices]
        pad = (-frames.shape[0]) % cfg.vision.temporal_patch_size
        if pad:
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
        patches, grid = patchify_frames(
            frames,
            patch_size=cfg.vision.patch_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            merge_size=cfg.vision.spatial_merge_size,
        )
        forced = None
        if use_gt:
            forced = np.asarray(
                session.builder.encode(turn.assistant_text + "<|im_end|>"), np.int32
            )
        response, _ = session.run_chunk(
            i, turn.start, pixel_patches=patches, grid_thw=grid,
            forced_response_ids=forced, question=turn.question,
        )
        if not quiet:
            print(f"Time={turn.start:.1f}-{turn.end:.1f}s: {response}")
        responses.append(
            {"response": response, "start_time": turn.start, "end_time": turn.end}
        )
        ground_truths.append(
            {"ground_truth": turn.assistant_text, "start_time": turn.start, "end_time": turn.end}
        )
    return responses, ground_truths
