"""Streaming engine: chunk prefill + fused decode over the KV arena.

One jitted `chunk_step` per (bucket, max_new) does everything the reference's
per-chunk generate does (stack 3.2 in SURVEY.md) in a single device dispatch:

  embed -> vision-embed scatter -> chunk prefill writing raw K/V into the
  arena -> lax.scan decode loop (sample, embed, forward, write KV) with
  repetition penalty / temperature / eos early-stop.

The reference's per-token python loop re-applies RoPE to the whole cache every
token in shrink mode (language_forward.py:190-197). Here positions are fixed
per chunk (contiguous re-index happens at eviction), K lives un-rotated in the
arena, and rotation is fused into attention — so a decode step costs one
arena sweep, same as the attention itself.

Eviction (arena compaction) is a single gather planned by the segment table.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SamplingConfig, StreamConfig
from ..models.qwen25_vl import language, model
from ..ops.quant import dequantize_kv, quantize_kv
from ..ops.sampling import sample_token
from ..utils.buckets import bucket_for

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# jitted device steps
# ---------------------------------------------------------------------------


def positions_from_descriptors(desc: Dict[str, jnp.ndarray], capacity: int) -> jnp.ndarray:
    """Rebuild the [3, C] mRoPE position tensor on device from the segment
    descriptor table (SegmentTable.position_descriptors) — ~2 KB shipped per
    chunk instead of [3, C] float32. Slots beyond the last real segment get
    garbage positions but are invisible to attention."""
    slot = jnp.arange(capacity, dtype=jnp.int32)
    # segment id by counting starts <= slot (descriptor table is sorted;
    # unused rows are padded with 2**30). The [C, max_segs] compare+reduce
    # beats lax.searchsorted's gather-based lowering ~2x on v5e at the
    # default operating point (tools/profile_variants.py) — but it is
    # O(C x max_segs): past the default 256-seg table (the full-attention
    # ablation accumulates thousands of segments over a long stream) the
    # compare matrix explodes, so switch to the O(C log S) searchsorted.
    max_segs = desc["starts"].shape[0]
    if capacity * max_segs > 8_000_000:
        sid = (
            jnp.searchsorted(desc["starts"], slot, side="right").astype(jnp.int32)
            - 1
        )
    else:
        sid = jnp.sum(desc["starts"][None, :] <= slot[:, None], axis=1) - 1
    sid = jnp.clip(sid, 0, None)
    off = slot - desc["starts"][sid]
    gh = desc["ghs"][sid]
    gw = desc["gws"][sid]
    is_vid = desc["kinds"][sid] == 1
    tstep = desc["tsteps"][sid]
    base = desc["bases"][sid]
    offf = off.astype(jnp.float32)
    t = jnp.where(is_vid, (off // (gh * gw)).astype(jnp.float32) * tstep, offf)
    h = jnp.where(is_vid, ((off // gw) % gh).astype(jnp.float32), offf)
    w = jnp.where(is_vid, (off % gw).astype(jnp.float32), offf)
    return base[None, :] + jnp.stack([t, h, w])


def _gather_slots(arena, src_idx: jnp.ndarray):
    """Gather arena slots along axis 1 for every leaf ([L, C, Hkv, hd] data
    and, for an int8 arena, its [L, C, Hkv] scales). The rank-3 view gathers
    ~15% faster than the 4D take on v5e (tools/profile_variants.py)."""

    def g(x):
        shp = x.shape
        x3 = x.reshape(shp[0], shp[1], -1)
        return jnp.take(x3, src_idx, axis=1).reshape(shp)

    return jax.tree_util.tree_map(g, arena)


def _merge_block(arena, block: jnp.ndarray, at):
    """Write a [L, T, Hkv, hd] float block into arena slots [at, at+T) in the
    arena's own representation — quantizing per slot when the arena is int8
    (StreamConfig.kv_quant)."""
    if isinstance(arena, dict):
        qb = quantize_kv(block)
        return {
            "q": jax.lax.dynamic_update_slice(arena["q"], qb["q"], (0, at, 0, 0)),
            "s": jax.lax.dynamic_update_slice(
                arena["s"], qb["s"].astype(arena["s"].dtype), (0, at, 0)
            ),
        }
    return jax.lax.dynamic_update_slice(
        arena, block.astype(arena.dtype), (0, at, 0, 0)
    )


@partial(jax.jit, donate_argnums=(0, 1, 2))
def compact_arena(
    k_arena,  # [L, C, Hkv, hd] (or int8 {"q","s"} pytree)
    v_arena,
    ids_arena: jnp.ndarray,  # [C] int32
    src_idx: jnp.ndarray,  # [C] int32 (padded with anything beyond new_len)
):
    """Gather arena slots: new[:, i] = old[:, src_idx[i]]. One sweep per chunk,
    dispatched right after the eviction plan so the device compacts WHILE the
    host assembles the next prompt."""
    return (
        _gather_slots(k_arena, src_idx),
        _gather_slots(v_arena, src_idx),
        jnp.take(ids_arena, src_idx, axis=0),
    )


@partial(jax.jit, donate_argnums=(0, 1, 2))
def compact_arena_batched(
    k_arena,  # [B, L, C, Hkv, hd] (or int8 pytree)
    v_arena,
    ids_arena: jnp.ndarray,  # [B, C]
    src_idx: jnp.ndarray,  # [B, C] (identity rows for unchanged streams)
):
    """Per-stream arena gathers for the multi-stream engine, one dispatch."""

    def one(k, v, ids, src):
        return (
            _gather_slots(k, src),
            _gather_slots(v, src),
            jnp.take(ids, src, axis=0),
        )

    return jax.vmap(one)(k_arena, v_arena, ids_arena, src_idx)


@dataclasses.dataclass
class ChunkHandle:
    """In-flight chunk: device futures + the host state finish_chunk needs."""

    gen: Any  # device array [max_new] int32
    n_gen: Any  # device scalar int32
    n_real: int
    next_p: float  # append-mode next position base
    eos: int
    gen_cm: Any  # open GEN timer section (or nullcontext)


@dataclasses.dataclass(frozen=True)
class ChunkStatics:
    """Static (compile-time) arguments of chunk_step."""

    cfg: ModelConfig
    t_pad: int  # padded chunk length
    max_new: int
    temperature: float
    repetition_penalty: float
    do_sample: bool
    # LiveCC-style threshold gate on the streaming-eos token (' ...'):
    # (token_id, base_threshold, step) — the token is suppressed while its
    # probability <= base + step * decode_step (reference
    # baselines/livecc/demo/infer.py:10-23)
    eos_threshold: Optional[Tuple[int, float, float]] = None
    # positions shipped as a descriptor table (shrink mode) instead of [3, C]
    use_descriptors: bool = False
    # pre-rotate the whole arena K once per chunk (fast steady-state default)
    # vs rotate inside attention from per-slot positions (no [L, C, Hkv, hd]
    # rotated copy — required when the arena is HBM-budget-bound, e.g. the
    # full-attention ablation whose arena holds the entire stream)
    prerotate: bool = True
    # raw-arena decode kernel (dequant + mRoPE in-kernel): None = auto
    # (env SVT_USE_PALLAS_DECODE_INT8), True/False force per engine
    decode_q8: Optional[bool] = None
    # "int8": store the per-chunk rotated K copy requantized (see
    # StreamConfig.rot_quant)
    rot_quant: str = "none"

    # NOTE: the frozen-dataclass __hash__ hashes cfg by VALUE (ModelConfig is a
    # frozen dataclass tree), matching __eq__ — two value-equal statics built
    # from distinct cfg objects (e.g. reloaded) hit the same jit cache entry.


@partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3, 8))
def chunk_step(
    statics: ChunkStatics,
    params: Params,
    k_arena: jnp.ndarray,
    v_arena: jnp.ndarray,
    slot_positions: jnp.ndarray,  # [3, C] float32 (covers chunk + decode slots)
    tokens: jnp.ndarray,  # [t_pad] int32 (padded)
    vis_embeds: Optional[jnp.ndarray],  # [N_vis, D] or None
    vis_slots: Optional[jnp.ndarray],  # [N_vis] int32 rows within the chunk
    ids_arena: jnp.ndarray,  # [C] int32 — token ids per arena slot
    insert_at: jnp.ndarray,  # scalar int32: first arena slot for chunk tokens
    n_real: jnp.ndarray,  # scalar int32: real (unpadded) chunk length
    eos_id: jnp.ndarray,  # scalar int32
    n_max: jnp.ndarray,  # scalar int32: decode budget <= statics.max_new
    # (TRACED, so per-call budgets never recompile; emission stops at the
    # budget exactly like a natural eos — a lane capped at m in a batched
    # round emits what a solo engine with max_new=m would)
    rng: jax.Array,
):
    """Returns (k_arena, v_arena, ids_arena, gen_tokens [max_new], n_gen,
    next_rng). The rng split lives IN the graph so the host never dispatches
    a separate tiny split computation per chunk (dispatch latency over the
    tunnel is ~2.5 ms).

    MEASURED NEGATIVE RESULT (round 2): fusing the eviction gather into this
    graph ("one dispatch per chunk") cost ~16 ms/chunk end-to-end — the
    separate compact_arena dispatch runs on-device DURING host-side prompt
    assembly, so its ~4 ms is free, and dispatch latency is already hidden
    by the async pipeline. Keep compaction a separate dispatch."""
    return _chunk_step_impl(
        statics, params, k_arena, v_arena, slot_positions, tokens,
        vis_embeds, vis_slots, ids_arena, insert_at, n_real, eos_id, n_max,
        rng,
    )


@partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3, 8))
def chunk_step_batched(
    statics: ChunkStatics,
    params: Params,
    k_arena: jnp.ndarray,  # [B, L, C, Hkv, hd] — stacked per-stream arenas
    v_arena: jnp.ndarray,
    slot_positions,  # [B, 3, C] f32, or descriptor dict of [B, max_segs]
    tokens: jnp.ndarray,  # [B, t_pad]
    vis_embeds: Optional[jnp.ndarray],  # [B, N_vis, D] or None
    vis_slots: Optional[jnp.ndarray],  # [B, N_vis]
    ids_arena: jnp.ndarray,  # [B, C]
    insert_at: jnp.ndarray,  # [B]
    n_real: jnp.ndarray,  # [B]
    eos_id: jnp.ndarray,  # [B]
    n_max: jnp.ndarray,  # [B] per-lane decode budgets <= statics.max_new
    # (a qa-injected lane can decode 64 tokens while the others keep their
    # <=20-token protocol — the round's scan length is the max, each lane
    # stops emitting at ITS budget)
    rng: jax.Array,  # [B, 2] per-stream keys
):
    """Multi-stream serving step: `chunk_step` vmapped over B independent
    streams sharing one set of weights (a capability the reference lacks —
    one stream per GPU, inference.py:72-74). At B=1 decode is weight-HBM-
    bandwidth-bound (docs/ROOFLINE_7B.md), so the per-layer weight reads
    amortise across streams: aggregate decode throughput scales ~B× until
    the MXU becomes the binding resource. Statics are shared (one bucket:
    pad every stream's chunk to the common t_pad; per-stream `n_real` keeps
    correctness)."""
    f = partial(_chunk_step_impl, statics, params)
    return jax.vmap(f)(
        k_arena, v_arena, slot_positions, tokens, vis_embeds, vis_slots,
        ids_arena, insert_at, n_real, eos_id, n_max, rng,
    )


def _chunk_step_impl(
    statics: ChunkStatics,
    params: Params,
    k_arena: jnp.ndarray,
    v_arena: jnp.ndarray,
    slot_positions,
    tokens: jnp.ndarray,
    vis_embeds: Optional[jnp.ndarray],
    vis_slots: Optional[jnp.ndarray],
    ids_arena: jnp.ndarray,
    insert_at: jnp.ndarray,
    n_real: jnp.ndarray,
    eos_id: jnp.ndarray,
    n_max: jnp.ndarray,
    rng: jax.Array,
):
    rng, _chunk_key = jax.random.split(rng)
    cfg = statics.cfg
    tcfg = cfg.text
    C = language.arena_capacity(k_arena)
    kv_quantized = isinstance(k_arena, dict)

    if statics.use_descriptors:
        slot_positions = positions_from_descriptors(slot_positions, C)

    # Rotate the whole arena K ONCE for this chunk's (fixed) positions: the
    # prefill kernel and all max_new decode steps then read pre-rotated K —
    # no per-attention-call cos/sin traffic or rotate work. The raw arena is
    # what persists across chunks (positions change at eviction).
    # prerotate=False skips the [L, C, Hkv, hd] rotated copy entirely and
    # rotates inside attention from per-slot positions (the reference's own
    # per-call semantics, language_forward.py:190-197) — slower per token but
    # half the arena HBM, which is what lets the full-attention ablation
    # (efficiency config a) hold a 1000 s stream on a 16 GB chip.
    from ..models.qwen25_vl.rope import apply_rope, make_inv_freq, mrope_cos_sin

    adt = (
        params["text"]["embed"].dtype if kv_quantized else k_arena.dtype
    )  # compute dtype of KV blocks/deltas (int8 arenas carry no float dtype)
    if statics.prerotate:
        inv_freq = jnp.asarray(make_inv_freq(tcfg.head_dim, tcfg.rope_theta))
        a_cos, a_sin = mrope_cos_sin(slot_positions, inv_freq, tcfg.mrope_section)
        # int8 arena: the dequantize fuses into this one elementwise rotate
        # pass (read int8+scales, write the chunk's bf16 rotated copy)
        if statics.rot_quant == "int8":
            # store the rotated copy REQUANTIZED: same HBM as the raw int8
            # arena, so the prerotate fast path fits where only raw mode
            # did (7B B=8 — BENCH_AB_DECODE_INT8_r05 killed the in-kernel
            # alternative); decode reads it through the fused per-layer
            # dequant (_deq_layer), the path already measured near its
            # convert-bound rate. One extra K quantization, re-derived
            # fresh each chunk (no error accumulation). The rotate runs as
            # a lax.map over LAYERS so the bf16 dequant+rotate transient is
            # one [C, Hkv, hd] layer, never a full-arena bf16 copy (a
            # whole-arena form measured 17.9 GB peak at 7B B=8 — the 5.6 GB
            # bf16 transient blew the chip).
            def rot_layer(lk):
                kf = dequantize_kv(lk, adt) if kv_quantized else lk
                kr = apply_rope(kf, a_cos[:, None, :], a_sin[:, None, :])
                return quantize_kv(kr)

            k_rot = jax.lax.map(rot_layer, k_arena)
        else:
            k_full = dequantize_kv(k_arena, adt) if kv_quantized else k_arena
            k_rot = apply_rope(k_full, a_cos[:, None, :], a_sin[:, None, :])

    # write the chunk's token ids, then build the repetition-penalty presence
    # mask fully on device (no host-side vocab bitmask upload)
    ids_arena = jax.lax.dynamic_update_slice(ids_arena, tokens, (insert_at,))
    valid = jnp.arange(C) < (insert_at + n_real)
    scatter_ids = jnp.where(valid, ids_arena, tcfg.vocab_size)  # OOB -> dropped
    presence = (
        jnp.zeros(tcfg.vocab_size, jnp.bool_)
        .at[scatter_ids]
        .set(True, mode="drop")
    )

    embeds = language.embed_tokens(tcfg, params["text"], tokens)
    if vis_embeds is not None:
        # drop: idle lanes in a batched round pass out-of-bounds slots (t_pad)
        # so a vision round leaves their token embeddings untouched
        embeds = embeds.at[vis_slots].set(
            vis_embeds.astype(embeds.dtype), mode="drop"
        )

    q_pos = jax.lax.dynamic_slice(
        slot_positions, (0, insert_at), (3, statics.t_pad)
    )

    # ---- chunk prefill: arena is READ-ONLY; the block's K/V come back as
    # [L, T, Hkv, hd] and merge with one dynamic_update_slice
    if statics.prerotate:
        prefill_arena = dict(arena=(k_rot, v_arena), arena_rotated=True)
    else:
        prefill_arena = dict(
            arena=(k_arena, v_arena),
            arena_rotated=False,
            arena_positions=slot_positions,
        )
    hidden, (k_block, k_block_rot, v_block) = language.language_forward_streaming(
        tcfg,
        params["text"],
        embeds,
        q_pos,
        visible_len=insert_at,
        **prefill_arena,
    )
    k_arena = _merge_block(k_arena, k_block, insert_at)
    if statics.prerotate:
        # _merge_block writes in the rotated copy's own representation
        # (requantizing the block when rot_quant="int8")
        k_rot = _merge_block(k_rot, k_block_rot.astype(adt), insert_at)
    v_arena = _merge_block(v_arena, v_block, insert_at)
    last_hidden = jax.lax.dynamic_slice(hidden, (n_real - 1, 0), (1, hidden.shape[1]))
    logits0 = language.lm_logits(tcfg, params["text"], last_hidden)[0]

    decode_base = insert_at + n_real  # first arena slot for generated tokens
    delta_pos = jax.lax.dynamic_slice(
        slot_positions, (0, decode_base), (3, statics.max_new)
    )
    L = tcfg.num_hidden_layers
    Hkv, hd = tcfg.num_key_value_heads, tcfg.head_dim
    delta_shape = (L, statics.max_new, Hkv, hd)

    def decode_body(carry, step):
        dk, dkr, dv, logits, presence, done, rng = carry
        rng, key = jax.random.split(rng)
        if statics.eos_threshold is not None:
            tok_id, base, step_sz = statics.eos_threshold
            thr = base + step_sz * step.astype(jnp.float32)
            prob = jax.nn.softmax(logits)[tok_id]
            logits = jnp.where(
                (jnp.arange(logits.shape[0]) == tok_id) & (prob <= thr),
                -jnp.inf,
                logits,
            )
        tok = sample_token(
            key,
            logits,
            presence,
            temperature=statics.temperature,
            repetition_penalty=statics.repetition_penalty,
            do_sample=statics.do_sample,
        )
        tok = jnp.where(done, eos_id, tok)
        presence = presence.at[tok].set(True)
        emitted = tok
        # a lane is done at its own budget even when the round's scan runs
        # longer (per-lane n_max in batched rounds); the trailing steps emit
        # eos with was_done=True, exactly like a natural early eos
        now_done = done | (tok == eos_id) | (step + 1 >= n_max)

        emb = language.embed_tokens(tcfg, params["text"], tok[None])
        pos = jax.lax.dynamic_slice(delta_pos, (0, step), (3, 1))
        # arena (incl. the merged chunk block, pre-rotated) + decode-delta-so-
        # far (also stored rotated); the arena is closed over, never carried
        # -> no per-token copies, no per-token rotation work.
        # prerotate=False: read the raw arena and rotate at attention time
        # (O(C) rotate work per token — the reference's own cost profile).
        if statics.prerotate:
            decode_arena = dict(arena=(k_rot, v_arena), arena_rotated=True)
        else:
            decode_arena = dict(
                arena=(k_arena, v_arena),
                arena_rotated=False,
                arena_positions=slot_positions,
            )
        hidden, (k1, k1_rot, v1) = language.language_forward_streaming(
            tcfg,
            params["text"],
            emb,
            pos,
            visible_len=decode_base,
            extra=(dkr, dv),
            extra_rotated=True,
            extra_visible=step,
            use_decode_int8=statics.decode_q8,
            **decode_arena,
        )
        dk = jax.lax.dynamic_update_slice(dk, k1.astype(adt), (0, step, 0, 0))
        dkr = jax.lax.dynamic_update_slice(dkr, k1_rot.astype(adt), (0, step, 0, 0))
        dv = jax.lax.dynamic_update_slice(dv, v1.astype(adt), (0, step, 0, 0))
        logits = language.lm_logits(tcfg, params["text"], hidden)[0]
        return (dk, dkr, dv, logits, presence, now_done, rng), (emitted, done)

    (dk, _, dv, _, presence, _, _), (gen, was_done) = jax.lax.scan(
        decode_body,
        (
            jnp.zeros(delta_shape, adt),
            jnp.zeros(delta_shape, adt),
            jnp.zeros(delta_shape, adt),
            logits0,
            presence,
            jnp.asarray(False),
            _chunk_key,
        ),
        jnp.arange(statics.max_new),
    )
    k_arena = _merge_block(k_arena, dk, decode_base)
    v_arena = _merge_block(v_arena, dv, decode_base)
    ids_arena = jax.lax.dynamic_update_slice(ids_arena, gen, (decode_base,))
    n_gen = jnp.sum(~was_done)
    return k_arena, v_arena, ids_arena, gen, n_gen, rng


# ---------------------------------------------------------------------------
# Host-side engine
# ---------------------------------------------------------------------------


def _bucket(n: int, buckets) -> int:
    return bucket_for(
        n, buckets, what="chunk",
        fix=(
            f" Fix: add a bucket >= {n} to StreamConfig.prefill_buckets "
            f"(each bucket compiles its own chunk_step executable), or "
            f"split the chunk."
        ),
    )


class StreamingEngine:
    """Owns the device arena + host segment table; one `process_chunk` per
    second of video. Mirrors the protocol of the reference's
    streaming_inference loop (inference.py:181-522) with static shapes."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Params,
        stream: StreamConfig,
        sampling: SamplingConfig,
        dtype=jnp.bfloat16,
        mesh=None,  # jax.sharding.Mesh: TP-sharded streaming (7B on v5e-8)
        allocate_arena: bool = True,  # False: arena owned externally
    ):
        from .segments import SegmentTable

        self.cfg = cfg
        self.params = params
        self.stream = stream
        self.sampling = sampling
        self.dtype = dtype
        self.table = SegmentTable(all_text=stream.all_text)
        self._mesh = mesh
        C = stream.kv_capacity
        if allocate_arena:
            self._check_hbm_budget()
            self.k_arena, self.v_arena = language.init_kv_arena(
                cfg.text, C, dtype, quant=stream.kv_quant
            )
            if mesh is not None:
                # the arena lives sharded over KV heads: each device keeps the
                # cache of the attention heads it owns; eviction gathers and
                # chunk-block merges stay device-local (no resharding traffic)
                from ..parallel.mesh import arena_sharding_tree

                sh = arena_sharding_tree(
                    mesh, cfg.text.num_key_value_heads, self.k_arena
                )
                self.k_arena = jax.device_put(self.k_arena, sh)
                self.v_arena = jax.device_put(self.v_arena, sh)
            self.ids_arena = jnp.zeros((C,), jnp.int32)
        else:
            # MultiStreamEngine owns the stacked [B, ...] arenas; this
            # per-stream engine keeps only host accounting (table/positions).
            self.k_arena = self.v_arena = self.ids_arena = None
        # identity gather for non-evicting chunks (uploaded once, reused)
        self._ident_src = jnp.arange(C, dtype=jnp.int32)
        self.cached = 0  # arena slots holding valid KV (table prefix)
        # append mode: per-slot positions are assigned once and never
        # re-indexed (reference pos_mode='append', model_forward.py:112-153)
        self._pos_host = np.zeros((3, C), np.float32)
        self._next_pos = 0.0  # last_cache_position + 1
        # trailing table tokens whose KV is NOT yet in the arena (e.g. the
        # force-appended <|im_end|>); they prefill with the next chunk, like
        # HF's cache-dependent input preparation re-forwards uncached ids
        self.uncached_tail = 0
        self.chunk_index = 0
        self.rng = jax.random.PRNGKey(sampling.seed)
        self._inflight: Optional[ChunkHandle] = None

    # -------------------------------------------------------------- plumbing
    def _check_hbm_budget(self) -> None:
        """Fail BEFORE allocating if the configured arena cannot fit the chip
        (VERDICT r2 weak #4: config (a) at the paper's 1000 s duration used to
        OOM mid-stream by construction). Budget: $SVT_HBM_BYTES override, the
        backend's reported limit, or 16 GB (v5e)."""
        import os

        t = self.cfg.text
        C = self.stream.kv_capacity
        item = jnp.dtype(self.dtype).itemsize
        kv_elems = t.num_hidden_layers * C * t.num_key_value_heads * t.head_dim
        if self.stream.kv_quant == "int8":
            # int8 data + f32 per-(slot, head) scales
            arena = 2 * int(kv_elems * (1 + 4.0 / t.head_dim))
        else:
            arena = 2 * kv_elems * item
        # the per-chunk rotated-K copy: engine dtype, or int8 + scales when
        # rot_quant="int8" (what makes prerotate fit at 7B B=8)
        if not self.stream.effective_prerotate:
            rot = 0
        elif self.stream.rot_quant == "int8":
            rot = int(kv_elems * (1 + 4.0 / t.head_dim))
        else:
            rot = kv_elems * item
        par = sum(
            x.size * jnp.dtype(x.dtype).itemsize
            for x in jax.tree_util.tree_leaves(self.params)
            if hasattr(x, "size")
        )
        # TP mesh: the budget is PER CHIP — the arena splits over kv heads
        # (arena_sharding) and weight bytes split over the model axis (the
        # TP rules shard every large matrix; treating params as fully split
        # is the same ~10%-headroom-level approximation as the transients)
        if self._mesh is not None:
            from ..parallel.mesh import arena_shard_factor

            f = arena_shard_factor(self._mesh, t.num_key_value_heads)
            arena, rot = arena // f, rot // f
            par //= int(self._mesh.shape.get("model", 1))
        budget = int(os.environ.get("SVT_HBM_BYTES", 0))
        if not budget:
            try:
                budget = jax.devices()[0].memory_stats().get("bytes_limit", 0)
            except Exception:
                budget = 0
            budget = budget or 16 * 2**30
        # prefill/decode transients (logits, activations, cos/sin tables) are
        # small next to arena+params; 10% headroom covers them
        need = int((arena + rot + par) * 1.1)
        if need > budget:
            gb = 2**30
            per_slot = (arena + rot) / C
            max_c = int((budget / 1.1 - par) / per_slot // 512 * 512)
            hint = (
                f"lower kv_capacity to <= {max_c}"
                if max_c >= 512
                else "this model does not fit at any capacity"
            )
            raise ValueError(
                f"HBM budget exceeded before streaming: KV arena "
                f"{arena / gb:.2f} GiB"
                + (f" + rotated copy {rot / gb:.2f} GiB" if rot else "")
                + f" + params {par / gb:.2f} GiB > budget {budget / gb:.2f} GiB. "
                f"Fix: {hint}, or set StreamConfig.kv_quant='int8' to halve "
                f"the arena, or prerotate_arena=False to drop the rotated "
                f"copy (slower per token), or shorten the stream/window so "
                f"fewer tokens survive eviction. Override the budget with "
                f"$SVT_HBM_BYTES."
            )

    def _positions(self) -> np.ndarray:
        return self.table.positions(
            spatial_merge_size=self.cfg.vision.spatial_merge_size,
            tokens_per_second=self.cfg.vision.tokens_per_second,
        )

    # -------------------------------------------------------------- snapshot
    def snapshot(self) -> Dict[str, Any]:
        """Full live-stream state (valid arena prefix + table + accounting +
        rng) as host numpy — see streaming/snapshot.py for the contract.
        Continue-after-restore is bitwise-equal to never having stopped."""
        from .snapshot import _slots_to_np, snapshot_host

        assert self.k_arena is not None, (
            "engine does not own an arena (multi-stream lane) — use "
            "MultiStreamEngine.snapshot_lane"
        )
        snap = snapshot_host(self)
        n = self.cached
        snap["ids"] = np.asarray(self.ids_arena[:n])
        snap["k"] = _slots_to_np(self.k_arena, n)
        snap["v"] = _slots_to_np(self.v_arena, n)
        return snap

    def restore(self, snap: Dict[str, Any]) -> None:
        """Adopt a snapshot (from `snapshot()` or snapshot.load_snapshot) in
        place of this engine's current stream. Config must agree on kv_quant
        and pos_mode; kv_capacity may differ as long as it holds `cached`
        slots. Geometry (L, Hkv, hd) is validated against the arena."""
        from .snapshot import _np_geometry, _write_slots, restore_host

        assert self.k_arena is not None, (
            "engine does not own an arena (multi-stream lane) — use "
            "MultiStreamEngine.restore_lane"
        )
        t = self.cfg.text
        geo = (t.num_hidden_layers, t.num_key_value_heads, t.head_dim)
        if int(snap["cached"]):
            assert _np_geometry(snap["k"]) == geo, (_np_geometry(snap["k"]), geo)
        restore_host(self, snap)
        n = self.cached
        ids = jnp.zeros((self.stream.kv_capacity,), jnp.int32)
        if n:
            ids = ids.at[:n].set(jnp.asarray(snap["ids"], jnp.int32))
        # ids stay UNcommitted (like the constructor's zeros): under a TP
        # mesh the arena is committed-sharded while small operands must stay
        # free for jit to replicate
        self.ids_arena = ids
        self.k_arena = _write_slots(self.k_arena, snap["k"], n)
        self.v_arena = _write_slots(self.v_arena, snap["v"], n)

    def prewarm(
        self,
        grids: Tuple[Tuple[int, int, int], ...] = (),
        *,
        max_new_list: Optional[Tuple[int, ...]] = None,
        buckets: Optional[Tuple[int, ...]] = None,
        vision: str = "none",  # {"none","frames","patches","both"}
        include_no_vision: bool = False,
        eos_threshold: Optional[Tuple[int, float, float]] = None,
    ) -> int:
        """Compile every executable the stream is configured to hit BEFORE the
        first chunk, so no chunk — including chunk 0 and any mid-stream
        prefill-bucket switch (Time-digit growth, a qa_stream injection) —
        pays a multi-second compile during a live stream (VERDICT r2 weak #1).

        Must be called before streaming starts (the dummy chunk_step calls
        write pad-token garbage into arena slots that are invisible at
        cached=0 and overwritten by the first real chunk). Compiles:

          * the eviction/compaction gather (identity over the empty arena),
          * per `grids` entry, the vision-encode executable(s): the uint8
            frames path (`vision="frames"`, bench/demo), the pre-patchified
            path (`"patches"`, serve), or both,
          * one chunk_step per (prefill bucket x max_new x vision variant):
            the vision variant is the per-grid video-token count, plus a
            no-vision variant when `include_no_vision` (text-only chunks).

        With no arguments this compiles only the compaction executable (the
        round-2 behaviour). Returns the number of chunk_step variants
        compiled. The engine's sampling rng is NOT consumed.

        SVT_PREWARM_VERBOSE=1 fences + logs after every phase (fault
        localisation on a flaky device)."""
        import os
        import sys as _sys
        import time as _time

        verbose = os.environ.get("SVT_PREWARM_VERBOSE") == "1"

        def _fence(tag):
            if verbose:
                t0 = _time.perf_counter()
                jax.block_until_ready(self.k_arena)
                print(
                    f"[prewarm] {tag} ok (+{_time.perf_counter() - t0:.1f}s)",
                    file=_sys.stderr,
                    flush=True,
                )

        self.k_arena, self.v_arena, self.ids_arena = compact_arena(
            self.k_arena, self.v_arena, self.ids_arena, self._ident_src
        )
        _fence("compaction")

        from ..models.qwen25_vl import model as _model

        vcfg = self.cfg.vision
        grids = tuple(tuple(int(x) for x in g) for g in grids)
        for g in grids:
            if vision in ("frames", "both"):
                frames = np.zeros(
                    (
                        g[0] * vcfg.temporal_patch_size,
                        g[1] * vcfg.patch_size,
                        g[2] * vcfg.patch_size,
                        3,
                    ),
                    np.uint8,
                )
                jax.block_until_ready(
                    _model.encode_video_frames(
                        self.cfg, self.params, frames, g, dtype=self.dtype
                    )
                )
                _fence(f"frames-encode {g}")
            if vision in ("patches", "both"):
                patch_dim = (
                    vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size**2
                )
                # HOST float32, like real callers ship (serve.py reads the
                # ingest pipeline's f32 patches): warms the f32->self.dtype
                # convert tiny-op AND the [S, patch_dim] host transfer that
                # _prepare_chunk's jnp.asarray(pixel_patches, self.dtype)
                # performs — a device-side jnp.zeros in the model dtype
                # would warm neither (the chunk-0-spike class).
                px = np.zeros((int(np.prod(g)), patch_dim), np.float32)
                jax.block_until_ready(
                    _model.encode_video(
                        self.cfg, self.params, jnp.asarray(px, self.dtype), (g,)
                    )
                )
                _fence(f"patches-encode {g}")

        st = self.stream
        if st.pos_mode == "shrink":
            desc, _, _, _ = self.table.position_descriptors(
                spatial_merge_size=vcfg.spatial_merge_size,
                tokens_per_second=vcfg.tokens_per_second,
                extra_text=1,
            )
            slot_pos = {k: jnp.asarray(v) for k, v in desc.items()}
        else:
            slot_pos = jnp.asarray(self._pos_host)

        vis_variants: List[Optional[int]] = [
            int(np.prod(g)) // vcfg.spatial_merge_unit for g in grids
        ]
        if include_no_vision or not grids:
            vis_variants.append(None)

        D = self.cfg.text.hidden_size
        n_compiled = 0
        zero = jnp.asarray(0, jnp.int32)
        eos = jnp.asarray(self.cfg.tokens.im_end, jnp.int32)
        for t_pad in buckets or st.prefill_buckets:
            # host numpy -> device_put, NOT jnp.full: the real chunk ships
            # tokens from host, and the first host->device transfer of a new
            # (shape, dtype) pays a ~35 ms handshake over the axon tunnel —
            # warm the same path the stream will use
            tokens = jnp.asarray(np.full(t_pad, self.cfg.tokens.pad, np.int32))
            for max_new in max_new_list or (st.max_tokens_per_chunk,):
                for n_vis in vis_variants:
                    statics = ChunkStatics(
                        cfg=self.cfg,
                        t_pad=t_pad,
                        max_new=max_new,
                        temperature=self.sampling.temperature,
                        repetition_penalty=self.sampling.repetition_penalty,
                        do_sample=self.sampling.do_sample,
                        eos_threshold=eos_threshold,
                        use_descriptors=(st.pos_mode == "shrink"),
                        prerotate=st.effective_prerotate,
                        decode_q8=st.decode_int8_kernel,
                        rot_quant=st.rot_quant,
                    )
                    ve = None if n_vis is None else jnp.zeros((n_vis, D), self.dtype)
                    vs = (
                        None
                        if n_vis is None
                        # host put, same path as the real chunk's vis_slots
                        else jnp.asarray(np.arange(n_vis, dtype=np.int32))
                    )
                    (
                        self.k_arena,
                        self.v_arena,
                        self.ids_arena,
                        _gen,
                        _n_gen,
                        _rng,
                    ) = chunk_step(
                        statics,
                        self.params,
                        self.k_arena,
                        self.v_arena,
                        slot_pos,
                        tokens,
                        ve,
                        vs,
                        self.ids_arena,
                        zero,  # insert_at
                        zero,  # n_real: the whole block is invisible padding
                        eos,
                        jnp.asarray(max_new, jnp.int32),
                        jax.random.PRNGKey(0),
                    )
                    n_compiled += 1
                    _fence(f"chunk_step t_pad={t_pad} max_new={max_new} n_vis={n_vis}")
        jax.block_until_ready(self.k_arena)
        return n_compiled

    def evict_plan(self):
        """Apply this round's eviction policy to the SEGMENT TABLE only and
        return the arena gather plan (host accounting updated; no device
        dispatch). Callers that own the arena themselves (MultiStreamEngine)
        use this + a batched gather; `evict()` is the single-stream form."""
        plan = self.table.evict(
            self.chunk_index,
            text_round=self.stream.text_round,
            visual_round=self.stream.visual_round,
            text_sink=self.stream.text_sink,
            text_sliding_window=self.stream.text_sliding_window,
        )
        new_len = int(plan.src.shape[0])
        if plan.changed and self.stream.pos_mode == "append":
            # positions travel with their slots; no re-indexing
            self._pos_host[:, :new_len] = self._pos_host[:, plan.src]
        if self.uncached_tail and plan.changed:
            # eviction may prune tokens FROM the uncached tail itself (e.g.
            # text_round=1 deletes the previous round's turn while its
            # force-appended <|im_end|> is still unforwarded). A pruned
            # uncached token simply ceases to exist — it has no KV to drop —
            # but the tail count must shrink with it, or the last CACHED
            # table token gets re-forwarded as "tail" and its arena slot is
            # overwritten with a different-context instance (the invariant:
            # same id, different instance = different KV = wrong results).
            src = np.asarray(plan.src)
            tail_mask = src >= self.cached
            new_tail = int(tail_mask.sum())
            if new_tail and not bool(tail_mask[new_len - new_tail :].all()):
                raise RuntimeError(
                    "eviction relocated uncached tokens away from the table "
                    "end; re-prefill cannot express a mid-table uncached "
                    "token (this text_round/GT-forcing combination is "
                    "unsupported — raise text_round or commit before "
                    "evicting)"
                )
            self.uncached_tail = new_tail
        self.cached = new_len - self.uncached_tail
        return plan

    def evict(self) -> None:
        """Apply this round's eviction policy and compact the arena. The
        gather dispatches IMMEDIATELY (before prompt assembly): the device
        compacts while the host builds the chunk — measured ~16 ms/chunk
        faster than fusing the gather into chunk_step.

        SVT_PERF_SKIP_COMPACT=1 is a PERF-ABLATION ONLY (results become
        numerically wrong): it skips the compaction dispatch while keeping
        every other cost identical, which upper-bounds what a ring-buffer
        arena (eviction = pointer advance, no gather) could ever win
        end-to-end (VERDICT r2 next #6). Use via bench.py
        --ab SVT_PERF_SKIP_COMPACT=1 — if the delta is ~0, the gather is
        fully hidden behind host work by the pipeline and the ring redesign
        cannot pay for its complexity."""
        import os

        plan = self.evict_plan()
        if plan.changed and os.environ.get("SVT_PERF_SKIP_COMPACT") != "1":
            C = self.stream.kv_capacity
            src = np.zeros(C, np.int32)
            src[: plan.src.shape[0]] = plan.src
            self.k_arena, self.v_arena, self.ids_arena = compact_arena(
                self.k_arena, self.v_arena, self.ids_arena, jnp.asarray(src)
            )

    def mark_all_uncached(self) -> None:
        """Invalidate the whole cache: every table token re-prefills with the
        next chunk (the reference's `recompute` ablation — efficiency config
        (c), eval/efficiency/efficiency_test.py:26-33)."""
        self.uncached_tail = self.table.total_len()
        self.cached = 0

    def upload_frames(self, frames_u8: np.ndarray):
        """Start an async host->device transfer of a chunk's uint8 frames —
        call for chunk i+1 before processing chunk i to overlap the copy with
        compute (the reference's decode/generate overlap north star)."""
        return jax.device_put(frames_u8)

    def process_chunk(self, *args, **kwargs) -> Tuple[np.ndarray, int]:
        """Synchronous wrapper: dispatch one chunk and block for its result.
        See process_chunk_async for the pipelined form (dispatch chunk i, then
        dispatch chunk i+1's vision encode, then finish_chunk(i) — hides host
        work and the next encode's dispatch behind the device step)."""
        return self.finish_chunk(self.process_chunk_async(*args, **kwargs))

    def process_chunk_async(
        self,
        chunk_segs: List,  # list of Seg to append for this chunk (incl. asst_open)
        pixel_patches: Optional[np.ndarray] = None,
        grid_thw: Optional[Tuple[int, int, int]] = None,
        *,
        frames_u8=None,  # [T, H, W, 3] uint8 (np array or device handle)
        vis_embeds=None,  # precomputed vision embeddings [N_vis, D]
        max_new: Optional[int] = None,
        recompute: bool = False,
        eos_id: Optional[int] = None,  # stop token (default <|im_end|>)
        eos_threshold: Optional[Tuple[int, float, float]] = None,
        timer=None,  # utils.profiling.SectionTimer: PKV/INPUT/GEN sections
    ) -> "ChunkHandle":
        """Evict, ingest one chunk (text+video segments ending with the
        assistant header), dispatch generation of up to max_new tokens.
        Returns a ChunkHandle; call finish_chunk(handle) to obtain
        (generated token ids INCLUDING the final eos, n_gen).

        With `timer`, accumulates the reference's section protocol
        (inference.py:312-329) with real device fences: PKV = eviction plan +
        arena compaction, INPUT = prompt/position/upload assembly, GEN =
        vision encode + fused prefill/decode + result transfer."""
        assert self._inflight is None, (
            "previous chunk not finished: call finish_chunk(handle) before "
            "the next process_chunk_async"
        )
        prep = self._prepare_chunk(
            chunk_segs,
            pixel_patches=pixel_patches,
            grid_thw=grid_thw,
            frames_u8=frames_u8,
            vis_embeds=vis_embeds,
            max_new=max_new,
            recompute=recompute,
            eos_id=eos_id,
            timer=timer,
        )
        max_new = prep["max_new"]
        st = self.stream
        statics = ChunkStatics(
            cfg=self.cfg,
            t_pad=prep["t_pad"],
            max_new=max_new,
            temperature=self.sampling.temperature,
            repetition_penalty=self.sampling.repetition_penalty,
            do_sample=self.sampling.do_sample,
            eos_threshold=eos_threshold,
            use_descriptors=(st.pos_mode == "shrink"),
            prerotate=st.effective_prerotate,
            decode_q8=st.decode_int8_kernel,
            rot_quant=st.rot_quant,
        )
        self.k_arena, self.v_arena, self.ids_arena, gen, n_gen, self.rng = chunk_step(
            statics,
            self.params,
            self.k_arena,
            self.v_arena,
            prep["slot_pos"],
            prep["tokens"],
            prep["vis_embeds"],
            prep["vis_slots"],
            self.ids_arena,
            jnp.asarray(self.cached, jnp.int32),
            jnp.asarray(prep["n_real"], jnp.int32),
            jnp.asarray(prep["eos"], jnp.int32),
            jnp.asarray(max_new, jnp.int32),
            self.rng,
        )
        self._inflight = ChunkHandle(
            gen=gen,
            n_gen=n_gen,
            n_real=prep["n_real"],
            next_p=prep["next_p"] if st.pos_mode == "append" else 0.0,
            eos=prep["eos"],
            gen_cm=prep["gen_cm"],
        )
        return self._inflight

    def _prepare_chunk(
        self,
        chunk_segs: List,
        *,
        pixel_patches=None,
        grid_thw=None,
        frames_u8=None,
        vis_embeds=None,
        max_new: Optional[int] = None,
        recompute: bool = False,
        eos_id: Optional[int] = None,
        timer=None,
        extra_slots: int = 0,  # decode-delta slack beyond max_new (spec decode)
        evict: bool = True,  # False: caller already ran evict_plan + gather
        device_arrays: bool = True,  # False: keep tokens/slot_pos/vis_slots
        # as host numpy (batched callers stack B preps host-side and ship
        # them in ONE dispatch — per-stream jnp.asarray would pay one
        # host<->device round-trip each, which dominates on high-RTT links)
    ) -> Dict[str, Any]:
        """Shared host-side chunk preparation: eviction, table append, token
        assembly, position descriptors/arrays, vision encode dispatch,
        capacity guard. Returns everything a device step needs; the 'GEN'
        timer section is left OPEN (the caller closes it when the step's
        result materialises)."""
        import contextlib

        import jax as _jax

        def sec(name, sync=None):
            return timer.section(name, sync=sync) if timer else contextlib.nullcontext()

        with sec("PKV", sync=(lambda: _jax.block_until_ready(self.k_arena)) if timer else None):
            if evict:
                self.evict()
            if recompute:
                self.mark_all_uncached()
        _input_cm = sec("INPUT")
        _input_cm.__enter__()

        max_new = max_new or self.stream.max_tokens_per_chunk
        st = self.stream
        tkn = self.cfg.tokens

        # re-forward any uncached tail tokens along with the chunk
        tail_ids = self.table.token_ids()[self.cached :] if self.uncached_tail else np.zeros(0, np.int32)
        new_ids = (
            np.concatenate([s.ids for s in chunk_segs if len(s)]).astype(np.int32)
            if chunk_segs
            else np.zeros(0, np.int32)
        )
        chunk_ids = np.concatenate([tail_ids, new_ids]).astype(np.int32)
        n_real = int(chunk_ids.shape[0])
        t_pad = _bucket(n_real, st.prefill_buckets)

        C = st.kv_capacity
        total = self.cached + n_real
        n_delta = max_new + extra_slots
        # chunk_step writes t_pad rows at insert_at=cached (the padded prefill
        # block) and n_delta rows at cached+n_real (the decode delta); BOTH
        # high-water marks must fit or dynamic_update_slice would clamp the
        # start index and silently overwrite valid cached KV misaligned.
        # Checked BEFORE the table append / tail reset below: a caller that
        # catches this ValueError (one oversized qa chunk on a long-running
        # session) must be left with a consistent, usable engine.
        high_water = max(self.cached + t_pad, total + n_delta)
        if high_water > C:
            raise ValueError(
                f"KV arena capacity exceeded: need {high_water} slots "
                f"(cached={self.cached}, chunk={n_real} padded to bucket "
                f"{t_pad}, max_new={max_new}) but kv_capacity={C}. Fix: raise "
                f"StreamConfig.kv_capacity to >= {high_water} (round up to a "
                f"multiple of 512), or lower window_size/text_round/"
                f"text_sink/text_sliding_window so fewer tokens survive "
                f"eviction, or add a smaller prefill bucket."
            )
        for s in chunk_segs:
            self.table.append(s)
        self.uncached_tail = 0
        assert total == self.table.total_len()

        if st.pos_mode == "shrink":
            # contiguous re-index over the whole surviving table every chunk;
            # positions rebuilt ON DEVICE from the ~2 KB descriptor table
            desc, n_segs, tot_full, next_p = self.table.position_descriptors(
                spatial_merge_size=self.cfg.vision.spatial_merge_size,
                tokens_per_second=self.cfg.vision.tokens_per_second,
                extra_text=n_delta,
            )
            assert tot_full == total + n_delta
            slot_pos = (
                {k: jnp.asarray(v) for k, v in desc.items()}
                if device_arrays
                else desc
            )
        else:  # append: chunk tokens extend from last_cache_position + 1
            from ..models.qwen25_vl.rope import (
                PosSegment,
                mrope_positions_from_segments,
            )

            psegs = []
            if len(tail_ids):
                psegs.append(PosSegment("text", int(len(tail_ids))))
            for s in chunk_segs:
                if s.kind == "vision" and not st.all_text:
                    psegs.append(
                        PosSegment(
                            "video",
                            len(s),
                            grid_thw=s.grid_thw,
                            second_per_grid_t=s.second_per_grid_t,
                        )
                    )
                elif len(s):
                    psegs.append(PosSegment("text", len(s)))
            cpos = (
                mrope_positions_from_segments(
                    psegs,
                    spatial_merge_size=self.cfg.vision.spatial_merge_size,
                    tokens_per_second=self.cfg.vision.tokens_per_second,
                )
                + self._next_pos
            )
            self._pos_host[:, self.cached : total] = cpos
            next_p = float(cpos.max()) + 1.0 if n_real else self._next_pos
            decode_pos = np.broadcast_to(
                np.arange(n_delta, dtype=np.float32) + next_p, (3, n_delta)
            )
            self._pos_host[:, total : total + n_delta] = decode_pos
            slot_pos = self._pos_host

        tokens = np.full(t_pad, tkn.pad, np.int32)
        tokens[:n_real] = chunk_ids
        _input_cm.__exit__(None, None, None)

        # vision embeds for this chunk + the fused prefill/decode step are the
        # GEN section (the reference counts the ViT inside generate's first
        # forward, model_forward.py:57-93)
        _gen_cm = sec("GEN")
        _gen_cm.__enter__()
        vis_slots = None
        if vis_embeds is not None:
            pass  # caller supplied (recompute mode: all surviving videos)
        elif frames_u8 is not None:
            vis_embeds = model.encode_video_frames(
                self.cfg, self.params, frames_u8, grid_thw, dtype=self.dtype
            )
        elif pixel_patches is not None:
            vis_embeds = model.encode_video(
                self.cfg, self.params, jnp.asarray(pixel_patches, self.dtype), (grid_thw,)
            )
        if vis_embeds is not None:
            # np.nonzero yields int64; convert HOST-side. A dtype-converting
            # jnp.asarray is a compiled op whose first call costs a remote
            # tiny-op compile (~350-700 ms measured over the axon tunnel,
            # below the persistent-cache threshold so every process repays
            # it) — it was the chunk-0 latency spike (2.5x p50) that full
            # executable prewarm could not remove. An int32 host array makes
            # this a plain device_put.
            # Slots come from SEGMENT provenance, not raw id matching: the
            # re-prefilled tail holds generated tokens, and a sampled token
            # equal to video_pad must not claim an embed row (the chunk spans
            # table[cached:], so the mask suffix lines up with chunk_ids;
            # recompute mode has cached=0 and re-embeds every survivor).
            (slots,) = np.nonzero(self.table.vision_mask()[self.cached :])
            slots = slots.astype(np.int32)
            vis_slots = jnp.asarray(slots) if device_arrays else slots

        eos = tkn.im_end if eos_id is None else eos_id
        return {
            "tokens": jnp.asarray(tokens) if device_arrays else tokens,
            "slot_pos": (
                slot_pos
                if isinstance(slot_pos, dict) or not device_arrays
                else jnp.asarray(slot_pos)
            ),
            "n_real": n_real,
            "t_pad": t_pad,
            "max_new": max_new,
            "vis_embeds": vis_embeds,
            "vis_slots": vis_slots,
            "eos": eos,
            "next_p": next_p,
            "gen_cm": _gen_cm,
        }

    def process_chunk_spec(
        self,
        chunk_segs: List,
        pixel_patches: Optional[np.ndarray] = None,
        grid_thw: Optional[Tuple[int, int, int]] = None,
        *,
        frames_u8=None,
        vis_embeds=None,
        max_new: Optional[int] = None,
        eos_id: Optional[int] = None,
        eos_threshold: Optional[Tuple[int, float, float]] = None,
        draft_fn: Optional[Callable] = None,
        k_draft: int = 7,
        timer=None,
    ) -> Tuple[np.ndarray, int]:
        """Speculative-decoding chunk (VERDICT r2 next #8; see
        streaming/specdecode.py for the mechanism and why). Protocol-
        equivalent to process_chunk + finish_chunk: greedy emits EXACTLY the
        autoregressive stream; sampling emits the same distribution.
        `draft_fn(context_ids, k) -> proposals` is the draft (e.g.
        NGramDraft); with no proposals every round degrades to one-token-
        per-round decoding (correct, just not faster). Returns
        (generated ids incl. final eos, count). Synchronous (each verify
        round needs the previous round's emitted ids on the host)."""
        from .specdecode import (
            SpecStatics,
            spec_commit_step,
            spec_prefill_step,
            spec_verify_step,
        )

        assert self._inflight is None
        assert self.stream.effective_prerotate, (
            "spec decode reads the pre-rotated arena; prerotate_arena=False "
            "is not supported"
        )
        k_pad = k_draft + 1
        prep = self._prepare_chunk(
            chunk_segs,
            pixel_patches=pixel_patches,
            grid_thw=grid_thw,
            frames_u8=frames_u8,
            vis_embeds=vis_embeds,
            max_new=max_new,
            eos_id=eos_id,
            timer=timer,
            extra_slots=k_pad,
        )
        max_new = prep["max_new"]
        n_delta = max_new + k_pad
        st = self.stream
        statics = SpecStatics(
            cfg=self.cfg,
            t_pad=prep["t_pad"],
            k_pad=k_pad,
            n_delta=n_delta,
            temperature=self.sampling.temperature,
            repetition_penalty=self.sampling.repetition_penalty,
            do_sample=self.sampling.do_sample,
            max_new=max_new,
            eos_threshold=eos_threshold,
            use_descriptors=(st.pos_mode == "shrink"),
        )
        decode_base = self.cached + prep["n_real"]
        (
            self.k_arena,
            self.v_arena,
            self.ids_arena,
            k_rot,
            pending,
            presence,
            delta_pos,
            self.rng,
        ) = spec_prefill_step(
            statics,
            self.params,
            self.k_arena,
            self.v_arena,
            prep["slot_pos"],
            prep["tokens"],
            prep["vis_embeds"],
            prep["vis_slots"],
            self.ids_arena,
            jnp.asarray(self.cached, jnp.int32),
            jnp.asarray(prep["n_real"], jnp.int32),
            jnp.asarray(prep["eos"], jnp.int32),
            self.rng,
        )

        L = self.cfg.text.num_hidden_layers
        Hkv = self.cfg.text.num_key_value_heads
        hd = self.cfg.text.head_dim
        shape = (L, n_delta, Hkv, hd)
        # deltas stay in the engine dtype regardless of arena representation;
        # spec_commit_step quantizes them on merge when kv_quant="int8"
        dd = self.dtype if isinstance(self.k_arena, dict) else self.k_arena.dtype
        dk = jnp.zeros(shape, dd)
        dkr = jnp.zeros(shape, dd)
        dv = jnp.zeros(shape, dd)

        emitted_all: List[int] = [int(pending)]
        ctx_ids = self.table.token_ids()
        n_delta_cur = 0
        done = False
        eos = prep["eos"]
        db = jnp.asarray(decode_base, jnp.int32)
        eosj = jnp.asarray(eos, jnp.int32)
        rounds = 0
        while not done and len(emitted_all) < max_new:
            full_ctx = np.concatenate(
                [ctx_ids, np.asarray(emitted_all, np.int32)]
            ).astype(np.int32)
            proposals = (
                np.asarray(draft_fn(full_ctx, k_draft), np.int32)
                if draft_fn is not None
                else np.zeros(0, np.int32)
            )
            draft = np.zeros(k_pad - 1, np.int32)
            n_prop = min(len(proposals), k_pad - 1)
            draft[:n_prop] = proposals[:n_prop]
            (
                dk, dkr, dv, presence, pending, emitted, n_emit, n_keep, done_d, self.rng,
            ) = spec_verify_step(
                statics,
                self.params,
                k_rot,
                self.v_arena,
                dk, dkr, dv,
                presence,
                pending,
                jnp.asarray(draft),
                jnp.asarray(n_prop, jnp.int32),
                jnp.asarray(n_delta_cur, jnp.int32),
                db,
                jnp.asarray(len(emitted_all), jnp.int32),
                delta_pos,
                eosj,
                self.rng,
            )
            ne = int(n_emit)
            emitted_np = np.asarray(emitted)[:ne]
            emitted_all.extend(int(t) for t in emitted_np)
            n_delta_cur += int(n_keep)
            done = bool(done_d)
            rounds += 1

        # merge delta + ids into the arena (rows beyond n_delta_cur are
        # invisible — accounting below only commits the valid prefix)
        pad_emit = np.zeros(n_delta, np.int32)
        pad_emit[: min(len(emitted_all), n_delta)] = emitted_all[:n_delta]
        self.k_arena, self.v_arena, self.ids_arena = spec_commit_step(
            self.k_arena, self.v_arena, self.ids_arena, dk, dv,
            jnp.asarray(pad_emit), db,
        )
        if prep["gen_cm"] is not None:
            jax.block_until_ready(self.k_arena)
            prep["gen_cm"].__exit__(None, None, None)

        # match finish_chunk / the reference: the FINAL sampled token of a
        # chunk is never committed — its KV re-prefills post-eviction with the
        # next chunk (keeps spec decode bitwise-equal to the AR path)
        n_commit = min(n_delta_cur, max(len(emitted_all) - 1, 0))
        self.cached += prep["n_real"] + n_commit
        if st.pos_mode == "append":
            self._next_pos = prep["next_p"] + len(emitted_all)
        gen_real = np.asarray(emitted_all, np.int32)
        self.uncached_tail = len(emitted_all) - n_commit
        assert self.uncached_tail in (0, 1, 2), self.uncached_tail
        if len(gen_real) == 0 or gen_real[-1] != eos:
            gen_real = np.concatenate([gen_real, [eos]]).astype(np.int32)
            self.uncached_tail += 1
        self.chunk_index += 1
        self._spec_rounds = rounds  # observability: forwards per chunk
        return gen_real, len(gen_real)

    def finish_chunk(self, handle: "ChunkHandle") -> Tuple[np.ndarray, int]:
        """Materialise an in-flight chunk's generation and commit host-side
        accounting. Must be called exactly once per process_chunk_async and
        before the next one; only the host blocks here — the device may
        already be running work dispatched after it (e.g. the next chunk's
        vision encode, the encoder/decoder-overlap north star)."""
        assert handle is self._inflight, "finish_chunk out of order"
        self._inflight = None
        gen = np.asarray(handle.gen)  # materialization fences the device step
        n_gen = int(handle.n_gen)
        if handle.gen_cm is not None:
            handle.gen_cm.__exit__(None, None, None)
        # Reference semantics (found by tests/test_reference_differential.py):
        # HF's _sample exits right after sampling, so the FINAL sampled token
        # of a chunk is never forwarded during that chunk — the reference
        # re-prefills it with the next chunk, i.e. its KV is computed under
        # the POST-eviction context (inference.py:309-455 + generate loop).
        # The in-scan KV written for it at slot cached+n_gen-1 is therefore
        # stale by protocol; leaving it un-committed makes the next chunk's
        # prefill overwrite that slot with the post-eviction KV.
        n_commit = max(n_gen - 1, 0)
        self.cached += handle.n_real + n_commit
        if self.stream.pos_mode == "append":
            self._next_pos = handle.next_p + n_gen
        gen_real = gen[:n_gen]
        eos = handle.eos
        self.uncached_tail = n_gen - n_commit
        # force-close like the reference (inference.py:456-459); the forced
        # token has no KV yet -> re-forwarded with the next chunk
        if n_gen == 0 or gen_real[-1] != eos:
            gen_real = np.concatenate([gen_real, [eos]]).astype(np.int32)
            self.uncached_tail += 1
        self.chunk_index += 1
        return gen_real, len(gen_real)

    def finish_idle(self, handle: "ChunkHandle") -> None:
        """Account an IDLE lane's round (multi-stream dynamic lanes): the
        batched step still ran the lane — re-forwarding any uncached tail
        (now cached) and free-running max_new decode tokens whose output is
        DISCARDED (their KV sits beyond `cached`, invisible, overwritten by
        the next real chunk). Nothing is appended to the table, so the
        invariant cached + uncached_tail == table length holds; chunk_index
        does not advance (the lane's stream clock is chunk-driven)."""
        assert handle is self._inflight, "finish_idle out of order"
        self._inflight = None
        np.asarray(handle.gen)  # materialisation fences the device step
        self.cached += handle.n_real
        if self.stream.pos_mode == "append":
            self._next_pos = handle.next_p

    def rollback_generation(self, n_emitted: int) -> None:
        """Drop the KV of the tokens generated this chunk (the last
        `n_emitted - uncached_tail` arena slots) — used by ground-truth
        teacher forcing, mirroring the reference's prune of the decoded turn
        (inference.py:483-487). Slots are simply un-counted; future writes
        overwrite them."""
        written = n_emitted - self.uncached_tail
        assert written >= 0
        self.cached -= written
        self.uncached_tail = 0

    def append_uncached(self, ids: np.ndarray) -> None:
        """Declare `ids` as table-resident but not yet forwarded — they will
        prefill with the next chunk (HF re-forwards uncached suffix ids)."""
        self.uncached_tail += len(ids)

    def commit_assistant(self, gen_real: np.ndarray, end_bias: int, rnd: int) -> None:
        """Record the generated assistant turn in the segment table, split into
        body / tail at `end_bias` tokens (reference strips " ...<|im_end|>"
        when relocating — inference.py:110-121)."""
        from .segments import ASST_BODY, ASST_TAIL, Seg

        gen_real = np.asarray(gen_real, np.int32)
        cut = max(len(gen_real) - end_bias, 0)
        self.table.append(Seg(ASST_BODY, gen_real[:cut], round=rnd))
        self.table.append(Seg(ASST_TAIL, gen_real[cut:], round=rnd))
