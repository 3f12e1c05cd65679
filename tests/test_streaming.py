"""Streaming-core equivalence tests.

The oracle below re-implements the REFERENCE's semantics directly: a flat
token sequence plus a per-layer dynamic KV cache (un-rotated K, like shrink
mode), edited by token-pattern scanning (resort/prune/cut, reference
inference.py:87-172), with RoPE re-applied to the whole cached K from freshly
re-indexed positions at every forward (language_forward.py:190-197). The
engine uses the segment table + fixed-capacity KV arena + fused-RoPE
attention. Both must produce the same surviving ids, the same positions, and
the same greedy generations — including after evictions, where cached K/V
(computed under the *old* context) must be preserved, not recomputed.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from streaming_vlm_tpu.config import SamplingConfig, StreamConfig, qwen25_vl_tiny
from streaming_vlm_tpu.models.qwen25_vl import model
from streaming_vlm_tpu.models.qwen25_vl.rope import mrope_positions_from_ids
from streaming_vlm_tpu.streaming.engine import StreamingEngine
from streaming_vlm_tpu.streaming.protocol import FakeTokenizer, PromptBuilder
from streaming_vlm_tpu.streaming.segments import scan_token_ranges

CFG = qwen25_vl_tiny()
TOK = CFG.tokens
GRID = (1, 4, 4)  # 4 llm tokens per chunk
PATCH_DIM = CFG.vision.in_channels * CFG.vision.temporal_patch_size * CFG.vision.patch_size**2
SPGT = 1.0


@pytest.fixture(scope="module")
def params():
    import jax

    return model.init_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)


class Oracle:
    """Reference-semantics stream state: flat ids + per-layer dynamic KV cache
    (K stored UN-rotated, shrink mode), edited by token scanning. Forwards run
    incrementally over the cache with RoPE re-applied to the full cached K
    from fresh contiguous positions, exactly like the reference's patched
    attention (language_forward.py:184-197)."""

    def __init__(self, params, start_bias, end_bias):
        import jax

        self.params = params
        self.ids = np.zeros(0, np.int32)
        self.n_videos = 0
        self.start_bias = start_bias
        self.end_bias = end_bias
        L = CFG.text.num_hidden_layers
        self.k_cache = [np.zeros((0, CFG.text.num_key_value_heads, CFG.text.head_dim), np.float32) for _ in range(L)]
        self.v_cache = [np.zeros((0, CFG.text.num_key_value_heads, CFG.text.head_dim), np.float32) for _ in range(L)]
        self.layer_params = [
            jax.tree.map(lambda x: x[i], params["text"]["layers"])
            for i in range(L)
        ]
        self._uncached = 0  # trailing ids (forced <|im_end|>) not yet forwarded

    # ---------------------------------------------------------- cache editing
    def _apply_index(self, idx: np.ndarray):
        self.ids = self.ids[idx]
        cache_len = self.k_cache[0].shape[0]
        cached_mask = idx < cache_len
        # eviction may prune uncached tail tokens themselves (text_round=1
        # deletes the prior turn while its forced <|im_end|> is still
        # unforwarded) — recount the surviving tail instead of assuming it
        n_tail = int((~cached_mask).sum())
        assert n_tail == 0 or bool(cached_mask[: len(idx) - n_tail].all()), (
            "uncached tokens relocated mid-table"
        )
        self._uncached = n_tail
        cidx = idx[cached_mask]
        for l in range(len(self.k_cache)):
            self.k_cache[l] = self.k_cache[l][cidx]
            self.v_cache[l] = self.v_cache[l][cidx]

    def _prune(self, s, e):
        n = len(self.ids)
        idx = np.concatenate([np.arange(0, s), np.arange(e + 1, n)])
        self._apply_index(idx)

    def evict(self, i, *, text_round, visual_round, sink, window):
        ids = self.ids

        if i >= text_round:
            a_s, a_e = scan_token_ranges(ids, "assistant", TOK)[0]
            p_s, p_e = scan_token_ranges(ids, "previous text", TOK)[0]
            p_end_im = p_e - 1 if ids[p_e] == TOK.newline else p_e
            if ids[a_e] == TOK.newline:
                src_s, src_e = a_s + self.start_bias, a_e - self.end_bias - 1
            else:
                src_s, src_e = a_s + self.start_bias, a_e - self.end_bias
            dst = p_end_im - 1
            if src_s <= src_e:
                n = len(ids)
                idx = np.concatenate(
                    [
                        np.arange(0, dst + 1),
                        np.arange(src_s, src_e + 1),
                        np.arange(dst + 1, src_s),
                        np.arange(src_e + 1, n),
                    ]
                )
                self._apply_index(idx)
            if visual_round > text_round:
                u_s, u_e = scan_token_ranges(self.ids, "user_text", TOK)[-text_round]
                self._prune(u_s, u_e)
            a_s, a_e = scan_token_ranges(self.ids, "assistant", TOK)[-text_round]
            self._prune(a_s, a_e)

        if i >= visual_round and visual_round < text_round:
            v_s, v_e = scan_token_ranges(self.ids, "vision", TOK)[0]
            self._prune(v_s, v_e)
            self.n_videos -= 1

        if i >= max(visual_round, text_round):
            u_s, u_e = scan_token_ranges(self.ids, "user", TOK)[0]
            had_vision = TOK.video_pad in self.ids[u_s : u_e + 1]
            self._prune(u_s, u_e)
            if had_vision:
                self.n_videos -= 1

        if i > 0 and (sink is not None or window is not None):
            p_s, p_e = scan_token_ranges(self.ids, "previous text", TOK)[0]
            cut_s = p_s + sink + 4 if sink is not None else p_s + 4
            cut_e = p_e - window - 1 if window is not None else p_e - 2
            if cut_s <= cut_e:
                self._prune(cut_s, cut_e)

    def positions(self, extra: int = 0):
        """Contiguous positions over surviving ids (+`extra` future text slots)."""
        ids = self.ids
        if extra:
            ids = np.concatenate([ids, np.zeros(extra, np.int32)])
        grids = (
            np.array([list(GRID)] * self.n_videos) if self.n_videos else None
        )
        pos, _ = mrope_positions_from_ids(
            ids,
            grids,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            tokens_per_second=CFG.vision.tokens_per_second,
            second_per_grid_ts=[SPGT] * self.n_videos,
            video_token_id=TOK.video_pad,
            image_token_id=TOK.image_pad,
        )
        return pos

    # ---------------------------------------------------------- forward
    def _forward(self, new_ids: np.ndarray, new_pixels):
        """Forward T new tokens through the decoder with the dynamic cache.
        Returns last-token logits."""
        from streaming_vlm_tpu.models.qwen25_vl.language import (
            _gqa_attention,
            embed_tokens,
            lm_logits,
            rms_norm,
            swiglu,
        )
        from streaming_vlm_tpu.models.qwen25_vl.rope import (
            apply_rope,
            make_inv_freq,
            mrope_cos_sin,
        )

        tcfg = CFG.text
        T = len(new_ids)
        self.ids = np.concatenate([self.ids, new_ids]).astype(np.int32)
        pos = self.positions()  # contiguous re-index over the FULL sequence
        S = pos.shape[1]

        emb = embed_tokens(tcfg, self.params["text"], jnp.asarray(new_ids, jnp.int32))
        if new_pixels is not None:
            vis = model.encode_video(CFG, self.params, jnp.asarray(new_pixels), (GRID,))
            (slots,) = np.nonzero(new_ids == TOK.video_pad)
            emb = emb.at[jnp.asarray(slots)].set(vis.astype(emb.dtype))

        inv_freq = jnp.asarray(make_inv_freq(tcfg.head_dim, tcfg.rope_theta))
        cos, sin = mrope_cos_sin(jnp.asarray(pos), inv_freq, tcfg.mrope_section)
        q_cos, q_sin = cos[-T:], sin[-T:]

        H, Hkv, hd = tcfg.num_attention_heads, tcfg.num_key_value_heads, tcfg.head_dim
        hidden = emb
        # right-aligned causal mask: q row i sees kv j <= S - T + i
        mask = jnp.arange(S)[None, :] <= (S - T + jnp.arange(T))[:, None]
        from streaming_vlm_tpu.ops.quant import mm

        for l, lp in enumerate(self.layer_params):
            x = rms_norm(hidden, lp["input_ln"], tcfg.rms_norm_eps)
            q = (mm(x, lp["q_w"]) + lp["q_b"]).reshape(T, H, hd)
            k_new = (mm(x, lp["k_w"]) + lp["k_b"]).reshape(T, Hkv, hd)
            v_new = (mm(x, lp["v_w"]) + lp["v_b"]).reshape(T, Hkv, hd)
            # cache update with UN-rotated K (shrink mode)
            self.k_cache[l] = np.concatenate([self.k_cache[l], np.asarray(k_new)])
            self.v_cache[l] = np.concatenate([self.v_cache[l], np.asarray(v_new)])
            q = apply_rope(q, q_cos[:, None, :], q_sin[:, None, :])
            k_full = apply_rope(
                jnp.asarray(self.k_cache[l]), cos[:, None, :], sin[:, None, :]
            )
            attn = _gqa_attention(q, k_full, jnp.asarray(self.v_cache[l]), mask)
            hidden = hidden + mm(attn, lp["o_w"])
            x = rms_norm(hidden, lp["post_ln"], tcfg.rms_norm_eps)
            hidden = hidden + swiglu(x, lp["gate_w"], lp["up_w"], lp["down_w"])
        hidden = rms_norm(hidden, self.params["text"]["final_ln"], tcfg.rms_norm_eps)
        return np.asarray(lm_logits(tcfg, self.params["text"], hidden))[-1]

    def ingest_and_generate(self, prompt_ids, pixels, max_new, rep_pen):
        self.n_videos += 1
        prompt_ids = np.asarray(prompt_ids, np.int32)
        if self._uncached:
            tail = self.ids[-self._uncached :]
            self.ids = self.ids[: -self._uncached]
            prompt_ids = np.concatenate([tail, prompt_ids])
            self._uncached = 0
        logits = self._forward(prompt_ids, pixels)
        out = []
        for j in range(max_new):
            presence = np.zeros(CFG.text.vocab_size, bool)
            presence[self.ids] = True
            scores = np.where(logits > 0, logits / rep_pen, logits * rep_pen)
            scores = np.where(presence, scores, logits)
            tok = int(np.argmax(scores))
            out.append(tok)
            if tok == TOK.im_end or j == max_new - 1:
                # reference semantics: HF's _sample exits right after sampling,
                # so the FINAL token of a chunk (natural eos or the max_new-th)
                # is never forwarded this chunk — it re-prefills with the next
                # chunk under the POST-eviction context
                self.ids = np.concatenate([self.ids, [tok]]).astype(np.int32)
                self._uncached += 1
                break
            logits = self._forward(np.array([tok], np.int32), None)
        if out[-1] != TOK.im_end:
            out.append(TOK.im_end)
            self.ids = np.concatenate([self.ids, [TOK.im_end]]).astype(np.int32)
            self._uncached += 1
        return np.array(out, np.int32)


def drive(params, *, n_chunks, text_round, visual_round, sink, window, max_new=4):
    stream = StreamConfig(
        text_round=text_round,
        window_size=visual_round,  # chunk_duration 1 -> visual_round == window_size
        chunk_duration=1,
        text_sink=sink,
        text_sliding_window=window,
        max_tokens_per_chunk=max_new,
        kv_capacity=1024,
        prefill_buckets=(64, 128, 256),
    )
    sampling = SamplingConfig(do_sample=False, repetition_penalty=1.05)
    engine = StreamingEngine(CFG, params, stream, sampling, dtype=jnp.float32)
    ftok = FakeTokenizer(TOK)
    builder = PromptBuilder(TOK, ftok)
    start_bias, end_bias = builder.measure_biases()
    oracle = Oracle(params, start_bias, end_bias)

    rng = np.random.default_rng(3)
    n_vid_tok = GRID[0] * (GRID[1] // 2) * (GRID[2] // 2)

    for i in range(n_chunks):
        pixels = rng.normal(size=(np.prod(GRID), PATCH_DIM)).astype(np.float32) * 0.1
        t0, t1 = float(i), float(i + 1)

        # ----- engine side
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments("hello prev"))
            segs.extend(
                builder.user_turn_segments(
                    0, t0, t1, n_vid_tok, GRID, SPGT, query="watch this"
                )
            )
        else:
            segs.extend(
                builder.user_turn_segments(i, t0, t1, n_vid_tok, GRID, SPGT)
            )
        segs.extend(builder.assistant_open_segments(i))

        gen_engine, _ = engine.process_chunk(segs, pixels, GRID)
        engine.commit_assistant(gen_engine, end_bias, i)

        # ----- oracle side
        oracle.evict(
            i,
            text_round=text_round,
            visual_round=visual_round,
            sink=sink,
            window=window,
        )
        if i == 0:
            text = (
                "<|im_start|>system\nYou are a helpful assistant.<|im_end|>"
                "\n<|im_start|>previous text\nhello prev<|im_end|>"
                f"\n<|im_start|>user\nTime={t0:.1f}-{t1:.1f}s"
                f"<|vision_start|>{'<|video_pad|>' * n_vid_tok}<|vision_end|>"
                "watch this<|im_end|>\n<|im_start|>assistant\n"
            )
        else:
            # training layout for turns i>0: 'Time=...s {question}' with the
            # space ALWAYS present (reference lmm_dataset.py:281; trailing
            # when the question is empty) — serve matches train byte-for-byte
            text = (
                f"\n<|im_start|>user\nTime={t0:.1f}-{t1:.1f}s "
                f"<|vision_start|>{'<|video_pad|>' * n_vid_tok}<|vision_end|>"
                "<|im_end|>\n<|im_start|>assistant\n"
            )
        gen_oracle = oracle.ingest_and_generate(ftok(text), pixels, max_new, 1.05)
        np.testing.assert_array_equal(
            gen_engine, gen_oracle, err_msg=f"generation diverged at chunk {i}"
        )
        # surviving ids + positions must match after the round completes
        np.testing.assert_array_equal(
            engine.table.token_ids(), oracle.ids, err_msg=f"ids diverged at chunk {i}"
        )
        np.testing.assert_allclose(
            engine._positions(), oracle.positions(), atol=1e-5,
            err_msg=f"positions diverged at chunk {i}",
        )
    return engine


def test_streaming_no_eviction(params):
    drive(params, n_chunks=3, text_round=16, visual_round=16, sink=None, window=None)


def test_streaming_with_eviction(params):
    # small rounds so eviction + relocation + sink/window cut all trigger
    drive(params, n_chunks=7, text_round=2, visual_round=2, sink=4, window=3, max_new=8)


def test_streaming_vision_outlives_text(params):
    drive(params, n_chunks=7, text_round=2, visual_round=4, sink=4, window=3, max_new=8)


def test_streaming_text_outlives_vision(params):
    drive(params, n_chunks=7, text_round=4, visual_round=2, sink=4, window=3, max_new=8)


def test_append_mode_matches_shrink_without_eviction(params):
    """With no evictions, append positions == shrink positions, so greedy
    generations must match exactly."""
    import dataclasses

    outs = {}
    for mode in ("shrink", "append"):
        stream = StreamConfig(
            text_round=16, window_size=16, chunk_duration=1,
            text_sink=None, text_sliding_window=None,
            max_tokens_per_chunk=4, kv_capacity=1024,
            prefill_buckets=(64, 128, 256), pos_mode=mode,
        )
        engine = StreamingEngine(
            CFG, params, stream, SamplingConfig(do_sample=False), dtype=jnp.float32
        )
        builder = PromptBuilder(TOK, FakeTokenizer(TOK))
        _, eb = builder.measure_biases()
        rng = np.random.default_rng(3)
        nv = 4
        gens = []
        for i in range(3):
            pixels = rng.normal(size=(np.prod(GRID), PATCH_DIM)).astype(np.float32) * 0.1
            segs = []
            if i == 0:
                segs.append(builder.system_segment())
                segs.extend(builder.previous_text_segments("hello prev"))
                segs.extend(builder.user_turn_segments(0, 0.0, 1.0, nv, GRID, SPGT, query="q"))
            else:
                segs.extend(builder.user_turn_segments(i, float(i), float(i + 1), nv, GRID, SPGT))
            segs.extend(builder.assistant_open_segments(i))
            g, _ = engine.process_chunk(segs, pixels, GRID)
            engine.commit_assistant(g, eb, i)
            gens.append(g.tolist())
        outs[mode] = gens
    assert outs["shrink"] == outs["append"]


def test_append_mode_positions_grow_after_eviction(params):
    """Append mode: after evictions, positions keep growing (never re-indexed)."""
    stream = StreamConfig(
        text_round=2, window_size=2, chunk_duration=1,
        text_sink=4, text_sliding_window=3,
        max_tokens_per_chunk=4, kv_capacity=1024,
        prefill_buckets=(64, 128, 256), pos_mode="append",
    )
    engine = StreamingEngine(
        CFG, params, stream, SamplingConfig(do_sample=False), dtype=jnp.float32
    )
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, eb = builder.measure_biases()
    rng = np.random.default_rng(3)
    nv = 4
    next_pos = []
    for i in range(5):
        pixels = rng.normal(size=(np.prod(GRID), PATCH_DIM)).astype(np.float32) * 0.1
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments("hello prev"))
            segs.extend(builder.user_turn_segments(0, 0.0, 1.0, nv, GRID, SPGT, query="q"))
        else:
            segs.extend(builder.user_turn_segments(i, float(i), float(i + 1), nv, GRID, SPGT))
        segs.extend(builder.assistant_open_segments(i))
        g, _ = engine.process_chunk(segs, pixels, GRID)
        engine.commit_assistant(g, eb, i)
        next_pos.append(engine._next_pos)
    assert all(b > a for a, b in zip(next_pos, next_pos[1:]))
    # table shrank (eviction happened) while positions kept growing
    assert engine.table.total_len() < next_pos[-1]


def test_recompute_mode_matches_full_forward(params):
    """Config (c): recompute=True drops the cache every chunk and re-prefases
    the whole surviving window — generations must equal a naive oracle that
    runs forward_full over the surviving ids (+ all surviving videos) for
    every decoded token."""
    stream = StreamConfig(
        text_round=2, window_size=2, chunk_duration=1,
        text_sink=None, text_sliding_window=None,
        max_tokens_per_chunk=4, kv_capacity=1024,
        prefill_buckets=(64, 128, 256, 512),
    )
    engine = StreamingEngine(
        CFG, params, stream, SamplingConfig(do_sample=False, repetition_penalty=1.05),
        dtype=jnp.float32,
    )
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, eb = builder.measure_biases()
    rng = np.random.default_rng(3)
    nv = 4
    recent = []  # surviving (pixels, grid), engine-side recompute bookkeeping

    for i in range(4):
        pixels = rng.normal(size=(np.prod(GRID), PATCH_DIM)).astype(np.float32) * 0.1
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments("hello prev"))
            segs.extend(builder.user_turn_segments(0, 0.0, 1.0, nv, GRID, SPGT, query="q"))
        else:
            segs.extend(builder.user_turn_segments(i, float(i), float(i + 1), nv, GRID, SPGT))
        segs.extend(builder.assistant_open_segments(i))

        recent.append(pixels)
        recent = recent[-stream.visual_round :]
        vis = jnp.concatenate(
            [model.encode_video(CFG, params, jnp.asarray(p), (GRID,)) for p in recent]
        )
        gen_e, _ = engine.process_chunk(
            segs, grid_thw=GRID, vis_embeds=vis, recompute=True
        )
        engine.commit_assistant(gen_e, eb, i)

        # oracle: table ids minus this round's generated suffix
        ids_full = engine.table.token_ids()
        n_gen = len(gen_e)
        base_ids = ids_full[: len(ids_full) - n_gen]
        grids = np.array([list(GRID)] * len(recent))
        pix = jnp.asarray(np.concatenate(recent))
        out = []
        cur = base_ids
        for _ in range(stream.max_tokens_per_chunk):
            logits = np.asarray(
                model.forward_full(
                    CFG, params, cur, pixel_patches=pix,
                    video_grid_thw=grids, second_per_grid_ts=[SPGT] * len(recent),
                )
            )[-1]
            presence = np.zeros(CFG.text.vocab_size, bool)
            presence[cur] = True
            scores = np.where(logits > 0, logits / 1.05, logits * 1.05)
            scores = np.where(presence, scores, logits)
            tok = int(np.argmax(scores))
            out.append(tok)
            cur = np.concatenate([cur, [tok]]).astype(np.int32)
            if tok == TOK.im_end:
                break
        if out[-1] != TOK.im_end:
            out.append(TOK.im_end)
        assert gen_e.tolist() == out, f"chunk {i}: {gen_e.tolist()} vs {out}"


# ---------------------------------------------------------------------------
# Default-config self-consistency: StreamConfig() defaults must survive a long
# stream at the default operating point (512 video tokens/chunk) — VERDICT r1
# flagged that kv_capacity=8192 crashed its own defaults around saturation.
# ---------------------------------------------------------------------------


def test_default_config_survives_100_chunks():
    import jax

    # 2-layer / 32-hidden model: the test exercises the HOST-side capacity
    # accounting + eviction policy at the real token counts; model size is
    # irrelevant to arena occupancy.
    cfg = dataclasses.replace(
        CFG,
        text=dataclasses.replace(
            CFG.text, num_hidden_layers=2, hidden_size=32,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            intermediate_size=64, mrope_section=(2, 3, 3),
        ),
    )
    stream = StreamConfig()  # ALL defaults
    sampling = SamplingConfig(do_sample=False)
    params = model.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    engine = StreamingEngine(cfg, params, stream, sampling, dtype=jnp.float32)
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, eb = builder.measure_biases()

    grid = (1, 32, 64)  # 512 llm tokens/chunk, the default operating point
    n_vid = 512
    D = cfg.text.hidden_size
    vis = jnp.zeros((n_vid, D), jnp.float32)
    spgt = 2.0 / stream.fps

    peak = 0
    for i in range(100):
        t0c, t1c = i * stream.chunk_duration, (i + 1) * stream.chunk_duration
        segs = []
        if i == 0:
            segs.append(builder.system_segment())
            segs.extend(builder.previous_text_segments("live"))
            segs.extend(
                builder.user_turn_segments(0, t0c, t1c, n_vid, grid, spgt, query="go")
            )
        else:
            segs.extend(builder.user_turn_segments(i, t0c, t1c, n_vid, grid, spgt))
        segs.extend(builder.assistant_open_segments(i))
        gen, _ = engine.process_chunk(segs, vis_embeds=vis, grid_thw=grid)
        engine.commit_assistant(gen, eb, i)
        peak = max(peak, engine.cached + engine.uncached_tail)
        assert engine.cached + engine.uncached_tail <= stream.kv_capacity
    # the stream must actually have reached KV saturation for this to mean much
    assert peak > 9000, f"stream never saturated (peak {peak})"


def test_capacity_overflow_is_a_clear_error():
    import jax

    stream = StreamConfig(kv_capacity=512, prefill_buckets=(64,), window_size=1 << 20,
                          text_round=1 << 20, text_sink=None, text_sliding_window=None)
    sampling = SamplingConfig(do_sample=False)
    params = model.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    engine = StreamingEngine(CFG, params, stream, sampling, dtype=jnp.float32)
    builder = PromptBuilder(TOK, FakeTokenizer(TOK))
    _, eb = builder.measure_biases()
    with pytest.raises(ValueError, match="kv_capacity"):
        for i in range(40):
            segs = []
            if i == 0:
                segs.append(builder.system_segment())
                segs.extend(builder.previous_text_segments(""))
            segs.extend(
                builder.user_turn_segments(i, float(i), i + 1.0, 4, GRID, SPGT,
                                           query="q" if i == 0 else None)
            )
            segs.extend(builder.assistant_open_segments(i))
            gen, _ = engine.process_chunk(
                segs,
                vis_embeds=jnp.zeros((4, CFG.text.hidden_size), jnp.float32),
                grid_thw=GRID,
            )
            engine.commit_assistant(gen, eb, i)


def test_position_descriptors_autosize_past_256_segments():
    """The full-attention ablation accumulates segments for the whole stream;
    the descriptor table must auto-grow past the old 256 cap (VERDICT r1
    weak #9) and keep producing correct positions."""
    from streaming_vlm_tpu.streaming.engine import positions_from_descriptors
    from streaming_vlm_tpu.streaming.segments import (
        SegmentTable, Seg, USER_TIME, VISION,
    )

    table = SegmentTable()
    # 300 alternating text/vision segments -> 600 raw, >256 merged
    for r in range(300):
        table.append(Seg(USER_TIME, np.arange(3, dtype=np.int32), round=r))
        table.append(
            Seg(VISION, np.full(4, TOK.video_pad, np.int32), round=r,
                grid_thw=(1, 4, 4), second_per_grid_t=1.0)
        )
    desc, n_segs, total, _ = table.position_descriptors(
        spatial_merge_size=2, tokens_per_second=2, extra_text=4
    )
    assert n_segs > 256
    assert desc["starts"].shape[0] == 1024  # next power-of-two bucket
    assert total == table.total_len() + 4

    # device reconstruction matches the host-side position computation
    C = total
    dev = positions_from_descriptors(
        {k: jnp.asarray(v) for k, v in desc.items()}, C
    )
    host = table.positions(spatial_merge_size=2, tokens_per_second=2)
    np.testing.assert_allclose(
        np.asarray(dev)[:, : host.shape[1]], host, atol=1e-5
    )


def test_streaming_text_round_one_prunes_uncached_tail(params):
    """text_round=1 prunes the PREVIOUS round's turn while its force-appended
    <|im_end|> is still the uncached tail: the token ceases to exist (it was
    never forwarded, so there is no KV to drop) and uncached_tail must shrink
    with it. Regression: the engine used to keep uncached_tail=1 and
    re-forward the last CACHED table token as 'tail', overwriting its arena
    slot with a different-context instance."""
    eng = drive(
        params, n_chunks=6, text_round=1, visual_round=3, sink=4, window=3,
        max_new=4,
    )
    assert eng.cached + eng.uncached_tail == eng.table.total_len()
