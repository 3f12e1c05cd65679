"""Multi-stream batched serving: N independent live streams on ONE chip.

The reference serves exactly one stream per GPU (`device_map="cuda"`,
reference inference.py:72-74); scaling to N viewers means N GPUs. On TPU the
economics invert: single-stream decode is weight-HBM-bandwidth-bound (3B int8
decode dense ~5.2 ms/tok vs a 3.7 ms weight-read roofline; docs/ROOFLINE_7B.md
for 7B), so the per-layer weight reads — the dominant cost — can be shared.
Batching B streams into one `chunk_step` amortises every weight read across
B token streams: aggregate decode throughput scales ~B× until the MXU (not
HBM) becomes the binding resource. Prefill is already MXU-bound and scales
~linearly, so the aggregate win settles between 1× and B× — measured with
`bench.py --streams N` (BENCH artifact carries the aggregate FPS).

Design: one stacked KV arena [B, L, C, Hkv, hd] + per-stream host
`StreamingEngine` instances (allocate_arena=False) that keep ONLY host state
(segment table, positions, cached/uncached accounting). Per round:

  1. every stream's eviction policy runs on the host (`evict_plan`), and the
     per-stream gather indices go to ONE `compact_arena_batched` dispatch;
  2. every stream's chunk is prepared by the SAME `_prepare_chunk` code the
     single-stream engine uses (evict=False), then padded to a COMMON prefill
     bucket and stacked;
  3. one `chunk_step_batched` (vmapped `chunk_step`) prefills + decodes all
     streams in lockstep — per-stream `n_real`/`insert_at`/positions/rng keep
     every stream's results exactly what a solo engine would produce
     (equivalence-tested in tests/test_multistream.py).

Streams advance in lockstep rounds. Streams may produce different chunk
lengths (their `Time=a-bs` digits differ etc.) — the shared bucket covers the
max. Per-stream early-eos works as in the single engine (done streams emit
eos padding in the scan). DYNAMIC LANES make the lockstep serve real,
asynchronous clients: a lane with no chunk this round passes `None`
(idle — state frozen, compute masked out; see process_round_async), and
`reset_lane` hands a finished lane to a new client mid-flight without
recompiling or disturbing the other streams — continuous batching expressed
on static shapes, which is the TPU-idiomatic form of it.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SamplingConfig, StreamConfig
from ..models.qwen25_vl import model
from .engine import (
    ChunkHandle,
    ChunkStatics,
    StreamingEngine,
    _bucket,
    chunk_step_batched,
    compact_arena_batched,
)

Params = Dict[str, Any]


class MultiStreamEngine:
    """Owns the stacked device arena for B streams + B host-side engines."""

    def __init__(
        self,
        cfg: ModelConfig,
        params: Params,
        stream: StreamConfig,
        sampling: SamplingConfig,
        n_streams: int,
        dtype=jnp.bfloat16,
        mesh=None,  # jax.sharding.Mesh: TP-sharded lanes (7B x N on v5e-8;
        # pass params already shard_params'd over the same mesh)
    ):
        assert n_streams >= 1
        self.cfg = cfg
        self.params = params
        self.stream = stream
        self.sampling = sampling
        self.dtype = dtype
        self.n = n_streams
        self._mesh = mesh
        self.engines = [
            StreamingEngine(
                cfg, params, stream, sampling, dtype=dtype, allocate_arena=False
            )
            for _ in range(n_streams)
        ]
        self._check_hbm_budget()
        t = cfg.text
        C = stream.kv_capacity
        # int8 lanes: the arena is the marginal HBM cost per stream, so
        # halving it is what raises the max lane count on one chip
        from ..models.qwen25_vl.language import init_kv_arena

        self.k_arena, self.v_arena = init_kv_arena(
            t, C, dtype, quant=stream.kv_quant, lead_dims=(n_streams,)
        )
        self.ids_arena = jnp.zeros((n_streams, C), jnp.int32)
        self._lane_sharding = None
        if mesh is not None:
            # TP: each device keeps every lane's cache for the kv heads it
            # owns — the batched step's gathers/merges stay device-local,
            # exactly the single-stream TP layout with a leading lane axis.
            # DP (mesh 'data' axis > 1, n_streams % data == 0): the LANE dim
            # additionally splits over 'data' — lane groups are fully
            # independent streams, so the step lowers with ZERO 'data'
            # collectives when params are serving-sharded
            # (parallel/mesh.py shard_params_serving: weights replicated
            # over 'data', TP over 'model').
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import _lane_axis, arena_sharding_tree

            sh = arena_sharding_tree(
                mesh, t.num_key_value_heads, self.k_arena, batched=True,
                lanes=n_streams,
            )
            self.k_arena = jax.device_put(self.k_arena, sh)
            self.v_arena = jax.device_put(self.v_arena, sh)
            lane_ax = _lane_axis(mesh, n_streams)
            self._lane_sharding = NamedSharding(mesh, P(lane_ax))
            self.ids_arena = jax.device_put(
                self.ids_arena, NamedSharding(mesh, P(lane_ax, None))
            )
        self._ident_src = np.arange(C, dtype=np.int32)
        self.rngs = jax.random.split(jax.random.PRNGKey(sampling.seed), n_streams)
        self._pin_lane_rows()
        self._inflight: Optional[List[ChunkHandle]] = None
        self._inflight_idle: Optional[List[bool]] = None
        self._gen_all = self._ngen_all = None

    def _pin_lane_rows(self) -> None:
        """Commit per-lane row state (sampling keys) to the lane sharding.
        Host-side `.at[b].set` edits (reset_lane/restore_lane) leave the
        result's placement compiler-chosen; an input whose sharding changed
        is a NEW executable, so re-pin after every such edit."""
        if self._lane_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self._mesh
            spec = tuple(self._lane_sharding.spec)
            lane_ax = spec[0] if spec else None
            self.rngs = jax.device_put(
                self.rngs, NamedSharding(mesh, P(lane_ax, None))
            )

    # ------------------------------------------------------------------ sizing
    def _check_hbm_budget(self) -> None:
        """Single-stream check scaled by B: B arenas + B rotated copies +
        ONE shared set of params (that sharing is the whole point)."""
        import os

        t = self.cfg.text
        C = self.stream.kv_capacity
        item = jnp.dtype(self.dtype).itemsize
        kv_elems = (
            self.n * t.num_hidden_layers * C * t.num_key_value_heads * t.head_dim
        )
        if self.stream.kv_quant == "int8":
            arena = 2 * int(kv_elems * (1 + 4.0 / t.head_dim))
        else:
            arena = 2 * kv_elems * item
        # the per-chunk rotated-K copies stay in the engine dtype either way
        rot = kv_elems * item if self.stream.effective_prerotate else 0
        par = sum(
            x.size * jnp.dtype(x.dtype).itemsize
            for x in jax.tree_util.tree_leaves(self.params)
            if hasattr(x, "size")
        )
        # TP mesh: per-chip budget (same approximation as the single-stream
        # guard — arena splits over kv heads, weight bytes over 'model')
        if self._mesh is not None:
            from ..parallel.mesh import arena_shard_factor

            # lanes= includes the DP split of the stacked arena over 'data';
            # params are counted per-chip over 'model' only (serving params
            # replicate over 'data' — shard_params_serving)
            f = arena_shard_factor(
                self._mesh, t.num_key_value_heads, lanes=self.n
            )
            arena, rot = arena // f, rot // f
            par //= int(self._mesh.shape.get("model", 1))
        budget = int(os.environ.get("SVT_HBM_BYTES", 0))
        if not budget:
            try:
                budget = jax.devices()[0].memory_stats().get("bytes_limit", 0)
            except Exception:
                budget = 0
            budget = budget or 16 * 2**30
        need = int((arena + rot + par) * 1.1)
        if need > budget:
            gb = 2**30
            per_stream = (arena + rot) / self.n
            max_b = int((budget / 1.1 - par) / per_stream)
            raise ValueError(
                f"HBM budget exceeded: {self.n} stream arenas "
                f"{arena / gb:.2f} GiB"
                + (f" + rotated copies {rot / gb:.2f} GiB" if rot else "")
                + f" + params {par / gb:.2f} GiB > budget {budget / gb:.2f} "
                f"GiB. Fix: at this kv_capacity the chip fits at most "
                f"{max_b} streams (or set kv_quant='int8' to halve the "
                f"arenas, lower kv_capacity, or set prerotate_arena=False). "
                f"Override with $SVT_HBM_BYTES."
            )

    # ------------------------------------------------------------------ vision
    def encode_round_mixed(
        self,
        pixel_patches: Sequence[Optional[np.ndarray]],  # per lane [S_b, pd]
        grids: Sequence[Optional[Tuple[int, int, int]]],
    ) -> List[Optional[jnp.ndarray]]:
        """Encode a HETEROGENEOUS round: each lane carries its own grid
        (clients stream at different resolutions — the deployment case the
        lockstep `encode_round` cannot express). One single-grid tower
        dispatch per lane with vision (the executables are the per-grid ones
        `prewarm(grids=...)` compiles; a new grid compiles once on first
        sight, exactly like a solo engine). Returns per-lane [n_vis_b, D]
        embeds (None where the lane has no vision) for
        `process_round_async(vis_embeds=<this list>)`."""
        assert len(pixel_patches) == len(grids) == self.n
        out: List[Optional[jnp.ndarray]] = []
        for pat, g in zip(pixel_patches, grids):
            if pat is None:
                out.append(None)
                continue
            assert g is not None, "pixel_patches without grid_thw"
            out.append(
                model.encode_video(
                    self.cfg,
                    self.params,
                    jnp.asarray(pat, self.dtype),
                    (tuple(int(x) for x in g),),
                )
            )
        return out

    def encode_round(self, pixel_patches, grid_thw) -> jnp.ndarray:
        """Encode every stream's chunk: B single-grid tower dispatches that
        pipeline back-to-back on the device queue, plus one stack.
        `pixel_patches` is [B, S, patch_dim] (same grid per stream this
        round); returns [B, S // merge_unit, D].

        MEASURED (2026-08-17, v5e-1, 3B int8, B=4 x 512 patches): the
        obvious one-dispatch formulation — multi-grid `encode_video` over
        the concatenated [B*S] sequence — runs at 1906 ms vs 124 ms for B
        sequential single-grid calls (15x): the multi-grid executable's
        full-attention layers mask a [B*S, B*S] score matrix to block-
        diagonal, paying B^2 the work. A vmapped single-grid tower measures
        the same 130 ms but is a NEW heavy executable (compile exposure on
        a flaky tunnel) — sequential wins on simplicity and reuses the
        single-stream tower executable unchanged."""
        B, S, pd = pixel_patches.shape
        assert B == self.n
        g = tuple(int(x) for x in grid_thw)
        pat = jnp.asarray(pixel_patches, self.dtype)
        embs = [
            model.encode_video(self.cfg, self.params, pat[b], (g,))
            for b in range(B)
        ]
        return jnp.stack(embs)

    # ------------------------------------------------------------------ round
    def evict_round(self) -> None:
        """Run every lane's eviction policy (host table edits) and apply the
        per-lane gather plans in ONE batched device dispatch. IDEMPOTENT
        between commits (the table policies are keyed on each lane's
        chunk_index, which only advances at commit): process_round_async
        invokes it at round start, and a serving layer may ALSO invoke it
        earlier so its admission decisions see post-evict occupancy — the
        same occupancy the round's capacity pre-pass certifies
        (multiserve._round_locked; checking pre-evict `cached` spuriously
        rejects steady-state chunks on a server whose kv_capacity is sized
        to the post-evict high-water the engine's own errors recommend)."""
        plans = [e.evict_plan() for e in self.engines]
        if any(p.changed for p in plans):
            src = np.tile(self._ident_src, (self.n, 1))
            for b, p in enumerate(plans):
                if p.changed:
                    src[b, : p.src.shape[0]] = p.src
            self.k_arena, self.v_arena, self.ids_arena = compact_arena_batched(
                self.k_arena, self.v_arena, self.ids_arena, jnp.asarray(src)
            )

    def round_capacity_error(
        self, n_reals: Sequence[int], max_new: int
    ) -> Optional[ValueError]:
        """The round's ATOMIC capacity pre-pass, as a question: would a
        batched round with these per-lane real token counts (idle lanes =
        their uncached tail) and this round-max decode budget overflow any
        lane? Every lane pays the round's SHARED bucket (the step's static
        prefill shape) and the SHARED decode-scan length, so the check
        covers idle lanes too. Returns the first offending lane's error
        without mutating anything, or None. Callers: process_round_async
        (raises it before any _prepare_chunk mutates) and the serving
        admission layer (rejects the offending chunk to its own client
        instead of fail-stopping — multiserve._shared_admission)."""
        st = self.stream
        t_shared = max(_bucket(n, st.prefill_buckets) for n in n_reals)
        for b, e in enumerate(self.engines):
            # the decode scan runs the ROUND max for every lane (capped
            # lanes stop emitting, but the delta block is sized max_new) —
            # budget the shared scan length, exactly like _prepare_chunk
            hw = max(e.cached + t_shared, e.cached + n_reals[b] + max_new)
            if hw > st.kv_capacity:
                return ValueError(
                    f"stream {b}: round needs {hw} slots (cached={e.cached},"
                    f" chunk={n_reals[b]} padded to the round's shared "
                    f"bucket {t_shared}, max_new={max_new}) but "
                    f"kv_capacity={st.kv_capacity}; raise kv_capacity or "
                    f"align stream protocols. No lane state was modified."
                )
        return None

    def process_round_async(
        self,
        chunk_segs: Sequence[Optional[List]],  # B lists of Seg; None = idle
        *,
        vis_embeds=None,  # [B, N_vis, D] (uniform round), a per-lane list of
        # Optional [n_vis_b, D] (MIXED-GRID round: encode_round_mixed), or
        # None (text-only round)
        grid_thw=None,  # one (t, h, w) for the round, or a per-lane list
        max_new: Optional[int] = None,
        eos_id: Optional[int] = None,
        eos_threshold: Optional[Tuple[int, float, float]] = None,
    ) -> List[ChunkHandle]:
        """Evict + ingest one chunk per stream, dispatch ONE batched step.
        Returns per-stream handles; call finish_round() to materialise.

        DYNAMIC LANES (continuous-batching on static shapes): a `None` entry
        means the lane is IDLE this round — no client chunk arrived. The lane
        still flows through the batched executable (shapes are static; its
        compute is wasted by design) via `_prepare_chunk([])`: any uncached
        tail re-forwards and becomes cached, the free-run decode output is
        discarded, its table/rng/chunk clock do not advance, and a vision
        round's embeds are dropped via out-of-bounds scatter slots. Lanes
        still run eviction, which keeps `cached` at the same post-evict bound
        the active-lane capacity guard certifies — so the lane's pad block
        never clamps onto valid KV. `reset_lane(b)` then hands the lane to a
        new client mid-flight (the stale arena content is invisible at
        cached=0). The reference cannot do any of this: one stream per GPU,
        process restart to switch streams (reference inference.py:72-74)."""
        assert self._inflight is None, "previous round not finished"
        assert len(chunk_segs) == self.n
        st = self.stream
        # per-lane decode budgets: a sequence gives each lane its own cap
        # (None entries = the default). The round's scan length is the max;
        # each lane stops emitting at ITS budget (traced n_max — a capped
        # lane produces exactly what a solo engine with max_new=cap would,
        # so a qa-injected lane decoding 64 tokens does not break the other
        # lanes' <=20-token protocol).
        if isinstance(max_new, (list, tuple, np.ndarray)):
            assert len(max_new) == self.n
            budgets = [
                int(m) if m is not None else st.max_tokens_per_chunk
                for m in max_new
            ]
        else:
            budgets = [int(max_new or st.max_tokens_per_chunk)] * self.n
        assert all(m >= 1 for m in budgets), budgets
        max_new = max(budgets)
        idle = [cs is None for cs in chunk_segs]
        mixed = isinstance(vis_embeds, (list, tuple))
        if mixed:
            assert len(vis_embeds) == self.n
        per_lane_grid = grid_thw is not None and not isinstance(
            grid_thw[0], (int, np.integer)
        )
        if per_lane_grid:
            assert len(grid_thw) == self.n

        # 1. eviction: host table edits, then one batched gather
        self.evict_round()

        # 1b. ATOMIC capacity pre-pass: every lane checked against the
        # round's SHARED bucket BEFORE any _prepare_chunk mutates (prep
        # appends table segments and zeroes uncached_tail — raising after
        # some lanes prepped would leave their tables claiming tokens whose
        # KV is never written, the non-recoverable state the solo engine
        # explicitly avoids by checking before its append).
        n_reals = [
            e.uncached_tail
            + (
                0
                if idle[b]
                else sum(len(s.ids) for s in chunk_segs[b])
            )
            for b, e in enumerate(self.engines)
        ]
        err = self.round_capacity_error(n_reals, max_new)
        if err is not None:
            raise err

        # 2. per-stream host prep via the single-stream code path; idle lanes
        # prep an empty chunk (tail re-forward only, no table append).
        # device_arrays=False: ALL stacking below happens in host numpy and
        # ships inside the ONE batched-step dispatch — per-stream jnp ops
        # would each pay a host<->device round-trip, which at B=4 over the
        # tunnel cost ~2.4 s/round vs the step's own 0.26 s (measured
        # 2026-08-17, tools/profile_batched.py).
        preps = [
            e._prepare_chunk(
                [] if idle[b] else list(chunk_segs[b]),
                # pass the WHOLE stacked/mixed structure, never vis_embeds[b]:
                # _prepare_chunk only checks not-None (vis_slots come from the
                # lane's own chunk_ids), and an eager per-lane device slice
                # costs B dispatches per round + tiny-op compiles on round 0
                # (measured 0.8 s of the round-0 spike at B=4)
                vis_embeds=(
                    None if vis_embeds is None or idle[b] else vis_embeds
                ),
                grid_thw=(
                    None
                    if idle[b]
                    else (grid_thw[b] if per_lane_grid else grid_thw)
                ),
                max_new=max_new,
                eos_id=eos_id,
                evict=False,
                device_arrays=False,
            )
            for b, e in enumerate(self.engines)
        ]

        # common bucket: every stream pads to the round's largest
        t_pad = max(p["t_pad"] for p in preps)
        pad_tok = self.cfg.tokens.pad
        tokens = np.full((self.n, t_pad), pad_tok, np.int32)
        for b, p in enumerate(preps):
            tk = np.asarray(p["tokens"])
            tokens[b, : tk.shape[0]] = tk
            hw = max(self.engines[b].cached + t_pad, p_high_water(self, b, p, max_new))
            if hw > st.kv_capacity:
                raise ValueError(
                    f"stream {b}: shared bucket {t_pad} overflows kv_capacity "
                    f"{st.kv_capacity} at cached={self.engines[b].cached}; "
                    f"raise kv_capacity or align stream protocols"
                )

        # positions: stack per-stream descriptor tables (shrink) or [3, C]
        if st.pos_mode == "shrink":
            keys = preps[0]["slot_pos"].keys()
            max_segs = max(p["slot_pos"]["starts"].shape[0] for p in preps)
            fill = {"starts": 2**30, "ghs": 1, "gws": 1, "tsteps": 1.0}
            slot_pos = {}
            for k in keys:
                first = np.asarray(preps[0]["slot_pos"][k])
                stacked = np.full(
                    (self.n, max_segs), fill.get(k, 0), first.dtype
                )
                for b, p in enumerate(preps):
                    v = np.asarray(p["slot_pos"][k])
                    stacked[b, : v.shape[0]] = v
                slot_pos[k] = stacked
        else:
            slot_pos = np.stack([np.asarray(p["slot_pos"]) for p in preps])

        vs = None
        ve = None
        if mixed:
            # MIXED-GRID round: lanes carry different vision-token counts
            # (heterogeneous client resolutions). Pad every lane to the
            # round's max count: the pad rows of `ve` point at slot t_pad,
            # which is out of bounds for the [t_pad, D] embed block, so the
            # scatter drops them (engine.py _chunk_step_impl, mode="drop") —
            # the same mechanism idle lanes already rely on. The executable
            # is keyed by max_nv, so rounds whose max matches a prewarmed
            # grid's count reuse that compile.
            # .shape metadata only — np.asarray(e) would COPY each lane's
            # whole [n_vis, D] embed block device->host every vision round
            # (~2 MB/lane over the 4-18 MB/s tunnel), blocking before the
            # step dispatch (the same pitfall fixed in the uniform path)
            counts = [
                0 if (e is None or idle[b]) else int(e.shape[0])
                for b, e in enumerate(vis_embeds)
            ]
            for b, p in enumerate(preps):
                # the converse of the supplied-but-no-pads assert below: a
                # lane whose chunk CARRIES video_pad tokens but got a None
                # embeds entry would silently forward raw pad-token
                # embeddings (garbage KV, no error)
                assert (
                    counts[b]
                    or idle[b]
                    or p["vis_slots"] is None
                    or p["vis_slots"].shape[0] == 0
                ), (
                    f"lane {b}: chunk carries video_pad tokens but its "
                    f"vis_embeds entry is None"
                )
            if any(counts):
                max_nv = max(counts)
                D = self.cfg.text.hidden_size
                vs = np.full((self.n, max_nv), t_pad, np.int32)
                rows = []
                for b, (p, e) in enumerate(zip(preps, vis_embeds)):
                    nb = counts[b]
                    if nb:
                        assert p["vis_slots"] is not None, (
                            f"lane {b}: vision embeds supplied but the chunk "
                            f"carries no video_pad tokens"
                        )
                        slots = np.asarray(p["vis_slots"])
                        assert slots.shape[0] == nb, (
                            f"lane {b}: chunk has {slots.shape[0]} video_pad "
                            f"tokens but {nb} vision embeds were supplied"
                        )
                        vs[b, :nb] = slots
                        row = jnp.asarray(e, self.dtype)
                        if nb < max_nv:
                            row = jnp.pad(row, ((0, max_nv - nb), (0, 0)))
                        rows.append(row)
                    else:
                        rows.append(jnp.zeros((max_nv, D), self.dtype))
                ve = jnp.stack(rows)
        elif vis_embeds is not None:
            # .shape only — np.asarray here would copy the whole [B, N, D]
            # embed tensor device->host (~17 MB at B=8) every round, blocking
            # the host BEFORE the step dispatch while the device sits idle
            n_vis = int(vis_embeds.shape[1])
            # a text-only ACTIVE lane still preps against the stacked
            # vis_embeds and gets an EMPTY (not None) vis_slots — it has no
            # video_pad tokens this round and must count as visionless
            active_nv = {
                p["vis_slots"].shape[0]
                for b, p in enumerate(preps)
                if not idle[b]
                and p["vis_slots"] is not None
                and p["vis_slots"].shape[0]
            }
            assert active_nv <= {n_vis}, (
                "every stream chunk carrying video must carry the round's "
                f"video-token count {n_vis} (got {active_nv}); mixed counts "
                "are not supported in batched mode"
            )
            # idle / text-only lanes: out-of-bounds slots -> the embed
            # scatter drops their rows of vis_embeds
            vs = np.full((self.n, n_vis), t_pad, np.int32)
            for b, p in enumerate(preps):
                if p["vis_slots"] is not None and p["vis_slots"].shape[0]:
                    vs[b] = np.asarray(p["vis_slots"])
            ve = (
                vis_embeds
                if isinstance(vis_embeds, jnp.ndarray)
                and vis_embeds.dtype == self.dtype
                else jnp.asarray(vis_embeds, self.dtype)
            )

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
        insert_at = np.asarray([e.cached for e in self.engines], np.int32)
        n_real = np.asarray([p["n_real"] for p in preps], np.int32)
        eos = np.asarray([p["eos"] for p in preps], np.int32)
        rngs_before = self.rngs
        (
            self.k_arena,
            self.v_arena,
            self.ids_arena,
            gen,
            n_gen,
            self.rngs,
        ) = chunk_step_batched(
            statics,
            self.params,
            self.k_arena,
            self.v_arena,
            slot_pos,
            tokens,
            ve,
            vs,
            self.ids_arena,
            insert_at,
            n_real,
            eos,
            np.asarray(budgets, np.int32),
            self.rngs,
        )
        if any(idle):
            # an idle lane's stream must resume exactly where a solo engine
            # that skipped the round would: its sampling rng does not advance
            keep = jnp.asarray(idle)[:, None]
            self.rngs = jnp.where(keep, rngs_before, self.rngs)
        # re-pin: eager ops normalize NamedSharding specs to a DIFFERENT
        # spelling (P(None,None) -> P()) and a re-spelled committed input is
        # a new jit-cache entry — the next round would recompile the whole
        # batched step. device_put returns the same object when the forms
        # already agree (measured), so this is free in the steady state.
        self._pin_lane_rows()
        handles = []
        for b, (p, e) in enumerate(zip(preps, self.engines)):
            # gen/n_gen stay None until finish_round fills them with numpy
            # rows from the ONE batched fetch. Eager `gen[b]` device slices
            # here would cost 2B tiny dispatches per round — and 2B tiny-op
            # REMOTE COMPILES on round 0 (each static slice index is its own
            # executable, ~300 ms each over the axon tunnel: measured as a
            # 2.9x round-0 spike at B=4) — for values nothing ever reads.
            h = ChunkHandle(
                gen=None,
                n_gen=None,
                n_real=p["n_real"],
                next_p=p["next_p"] if st.pos_mode == "append" else 0.0,
                eos=p["eos"],
                gen_cm=None,
            )
            e._inflight = h
            handles.append(h)
        self._inflight = handles
        self._inflight_idle = idle
        # finish_round fetches these with TWO host transfers total; the
        # per-handle gen[b]/n_gen[b] views would cost 2B round-trips
        self._gen_all, self._ngen_all = gen, n_gen
        return handles

    def finish_round(
        self, handles: Optional[List[ChunkHandle]] = None
    ) -> List[Optional[Tuple[np.ndarray, int]]]:
        """Materialise the round: per-stream (generated ids incl. eos, n);
        None for lanes that were idle this round."""
        handles = handles or self._inflight
        assert handles is self._inflight
        idle = self._inflight_idle
        self._inflight = None
        self._inflight_idle = None
        gen_all = np.asarray(self._gen_all)  # ONE transfer for all lanes
        ngen_all = np.asarray(self._ngen_all)
        self._gen_all = self._ngen_all = None
        out = []
        for b, (e, h) in enumerate(zip(self.engines, handles)):
            h.gen, h.n_gen = gen_all[b], int(ngen_all[b])
            if idle[b]:
                e.finish_idle(h)
                out.append(None)
            else:
                out.append(e.finish_chunk(h))
        return out

    def process_round(self, *args, **kwargs) -> List[Tuple[np.ndarray, int]]:
        return self.finish_round(self.process_round_async(*args, **kwargs))

    def commit_assistant(
        self, gens: Sequence[Optional[np.ndarray]], end_bias: int, rnd: int
    ) -> None:
        """Commit each lane's generation; None entries (idle lanes) skip."""
        for e, g in zip(self.engines, gens):
            if g is not None:
                e.commit_assistant(g, end_bias, rnd)

    def reset_lane(self, b: int, seed: Optional[int] = None) -> None:
        """Hand lane b to a NEW client stream mid-flight: fresh host state
        (segment table, positions, accounting) and a fresh sampling key. The
        lane's stale arena content needs no clearing — at cached=0 nothing
        is visible and the first chunk overwrites from slot 0. Other lanes
        are untouched (their executables never recompile: shapes are
        static)."""
        assert self._inflight is None, "reset_lane mid-round"
        self.engines[b] = StreamingEngine(
            self.cfg,
            self.params,
            self.stream,
            self.sampling,
            dtype=self.dtype,
            allocate_arena=False,
        )
        key = jax.random.PRNGKey(
            self.sampling.seed + 1 + b if seed is None else seed
        )
        self.rngs = self.rngs.at[b].set(jax.random.split(key, 1)[0])
        self._pin_lane_rows()

    # ------------------------------------------------------------------ snapshot
    def snapshot_lane(self, b: int):
        """Serialize lane b's live stream (streaming/snapshot.py): same
        format as StreamingEngine.snapshot(), so a lane can be checkpointed,
        restored into a solo engine on another chip, or vice versa. The
        lane's sampling key (self.rngs[b], not the lane engine's unused
        .rng) rides along, so sampled continuations stay deterministic."""
        from .snapshot import _slots_to_np, snapshot_host

        assert self._inflight is None, "snapshot_lane mid-round"
        eng = self.engines[b]
        snap = snapshot_host(eng)
        snap["rng"] = np.asarray(self.rngs[b])
        n = eng.cached
        snap["ids"] = np.asarray(self.ids_arena[b, :n])
        snap["k"] = _slots_to_np(
            jax.tree_util.tree_map(lambda x: x[b], self.k_arena), n
        )
        snap["v"] = _slots_to_np(
            jax.tree_util.tree_map(lambda x: x[b], self.v_arena), n
        )
        return snap

    def restore_lane(self, b: int, snap) -> None:
        """Adopt a snapshot into lane b (live-stream migration INTO the
        batched server): fresh host engine + lane rows of the stacked
        arenas. Other lanes are untouched and nothing recompiles (static
        shapes). Continuation is bitwise what the source engine would have
        produced (tests/test_snapshot.py)."""
        from .snapshot import restore_host

        assert self._inflight is None, "restore_lane mid-round"
        self.engines[b] = StreamingEngine(
            self.cfg,
            self.params,
            self.stream,
            self.sampling,
            dtype=self.dtype,
            allocate_arena=False,
        )
        eng = self.engines[b]
        restore_host(eng, snap)
        self.rngs = self.rngs.at[b].set(jnp.asarray(snap["rng"]))
        n = eng.cached
        C = self.stream.kv_capacity
        ids_row = np.zeros(C, np.int32)
        ids_row[:n] = np.asarray(snap["ids"], np.int32)
        self.ids_arena = self.ids_arena.at[b].set(jnp.asarray(ids_row))

        def write(arena, prefix):
            def one(x, p):
                row = jnp.zeros(x.shape[1:], x.dtype)
                if n:
                    row = row.at[:, :n].set(jnp.asarray(p).astype(x.dtype))
                return x.at[b].set(row)

            return jax.tree_util.tree_map(one, arena, prefix)

        self.k_arena = write(self.k_arena, snap["k"])
        self.v_arena = write(self.v_arena, snap["v"])
        if self._mesh is not None:
            # re-pin the kv-head (and DP lane) sharding: .at[b].set output
            # placement is compiler-chosen, and a resharded/replicated arena
            # would both recompile the batched step and undo the TP/DP
            # memory split
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import _lane_axis, arena_sharding_tree

            sh = arena_sharding_tree(
                self._mesh, self.cfg.text.num_key_value_heads, self.k_arena,
                batched=True, lanes=self.n,
            )
            self.k_arena = jax.device_put(self.k_arena, sh)
            self.v_arena = jax.device_put(self.v_arena, sh)
            lane_ax = _lane_axis(self._mesh, self.n)
            self.ids_arena = jax.device_put(
                self.ids_arena, NamedSharding(self._mesh, P(lane_ax, None))
            )
            self._pin_lane_rows()

    # ------------------------------------------------------------------ warmup
    def prewarm(
        self,
        grids: Tuple[Tuple[int, int, int], ...] = (),
        *,
        buckets: Optional[Tuple[int, ...]] = None,
        max_new_list: Optional[Tuple[int, ...]] = None,
        include_no_vision: bool = False,
        eos_threshold: Optional[Tuple[int, float, float]] = None,
    ) -> int:
        """Compile the batched compaction + every (bucket × max_new × vision)
        chunk_step_batched variant before round 0 (same glitch-freedom
        contract as StreamingEngine.prewarm)."""
        st = self.stream
        C = st.kv_capacity
        self.k_arena, self.v_arena, self.ids_arena = compact_arena_batched(
            self.k_arena,
            self.v_arena,
            self.ids_arena,
            jnp.asarray(np.tile(self._ident_src, (self.n, 1))),
        )
        vcfg = self.cfg.vision
        D = self.cfg.text.hidden_size
        mu = vcfg.spatial_merge_unit
        grids = tuple(tuple(int(x) for x in g) for g in grids)
        patch_dim = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size**2
        vis_variants: List[Optional[int]] = []
        for g in grids:
            S = int(np.prod(g))
            # HOST float32 patches, like real callers ship: warms the
            # f32->model-dtype convert tiny-op and the host->device
            # transfer handshakes the first real round would otherwise pay
            # (engine.prewarm has the same rule). Both shapes matter: the
            # [B, S, pd] uniform encode_round AND the [S, pd] per-lane
            # transfer encode_round_mixed performs (the server's path).
            jax.block_until_ready(
                self.encode_round(np.zeros((self.n, S, patch_dim), np.float32), g)
            )
            jax.block_until_ready(
                model.encode_video(
                    self.cfg,
                    self.params,
                    jnp.asarray(np.zeros((S, patch_dim), np.float32), self.dtype),
                    (g,),
                )
            )
            vis_variants.append(S // mu)
        if include_no_vision or not grids:
            vis_variants.append(None)

        # mixed-grid rounds (process_round_async with a per-lane embeds
        # list — the path a MultiStreamServer ALWAYS takes, even when every
        # client streams one resolution) pad each lane's [nb, D] embeds to
        # the round max, zero-fill visionless lanes, and stack B rows —
        # eager tiny ops whose FIRST use would otherwise pay a remote
        # compile mid-stream (the chunk-0-spike class; CLAUDE.md: never
        # introduce first-use tiny eager ops after prewarm). Warm the
        # zeros + stack at EVERY count a round's max can take (including
        # the single-grid case and rounds whose max is the smallest grid),
        # and every (nb -> mx) pad pair.
        counts = sorted({v for v in vis_variants if v is not None})
        for mx in counts:
            z = jnp.zeros((mx, D), self.dtype)
            jax.block_until_ready(jnp.stack([z] * self.n))
            for nb in counts:
                if nb < mx:
                    jax.block_until_ready(
                        jnp.pad(
                            jnp.zeros((nb, D), self.dtype),
                            ((0, mx - nb), (0, 0)),
                        )
                    )

        # HOST numpy for every row-state input, exactly like the real rounds
        # (device_arrays=False host assembly): the jit's own put warms the
        # transfer AND the cpp-fastpath cache entry real rounds will hit — a
        # prewarm-side jnp array is a different entry form and round 0 would
        # take the slow python dispatch path once per executable.
        if st.pos_mode == "shrink":
            desc, _, _, _ = self.engines[0].table.position_descriptors(
                spatial_merge_size=vcfg.spatial_merge_size,
                tokens_per_second=vcfg.tokens_per_second,
                extra_text=1,
            )
            slot_pos = {
                k: np.tile(v, (self.n, 1)) for k, v in desc.items()
            }
        else:
            slot_pos = np.zeros((self.n, 3, C), np.float32)

        zero = np.zeros((self.n,), np.int32)
        eos = np.full((self.n,), self.cfg.tokens.im_end, np.int32)
        n_compiled = 0
        for t_pad in buckets or st.prefill_buckets:
            tokens = np.full((self.n, t_pad), self.cfg.tokens.pad, np.int32)
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
                    ve = (
                        None
                        if n_vis is None
                        else jnp.zeros((self.n, n_vis, D), self.dtype)
                    )
                    vs = (
                        None
                        if n_vis is None
                        else np.tile(np.arange(n_vis, dtype=np.int32), (self.n, 1))
                    )
                    (
                        self.k_arena,
                        self.v_arena,
                        self.ids_arena,
                        _g,
                        _n,
                        _r,
                    ) = chunk_step_batched(
                        statics,
                        self.params,
                        self.k_arena,
                        self.v_arena,
                        slot_pos,
                        tokens,
                        ve,
                        vs,
                        self.ids_arena,
                        zero,
                        zero,
                        eos,
                        np.full((self.n,), max_new, np.int32),
                        # self.rngs, NOT a fresh split: under a mesh the
                        # lane rngs are COMMITTED to a lane sharding
                        # (_pin_lane_rows), and a committed input is a
                        # DIFFERENT jit-cache entry than an uncommitted one
                        # — prewarming with fresh keys would leave round 0
                        # to recompile the whole batched step mid-stream
                        # (verified: _cache_size 1->2). rngs are not
                        # donated; the dummy step leaves them untouched.
                        self.rngs,
                    )
                    n_compiled += 1
        # idle-lane rng freeze (process_round_async): warm the bool-list
        # asarray + where pair so the FIRST idle round doesn't pay their
        # tiny-op remote compiles mid-stream
        keep = jnp.asarray([False] * self.n)[:, None]
        self.rngs = jnp.where(keep, self.rngs, self.rngs)
        # the eager where above re-spells the rng sharding (P(...) -> P());
        # re-pin so round 0's committed input matches what the dummy steps
        # just compiled against (see process_round_async)
        self._pin_lane_rows()
        jax.block_until_ready(self.k_arena)
        return n_compiled


def p_high_water(ms: MultiStreamEngine, b: int, prep: Dict, max_new: int) -> int:
    """Stream b's decode-delta high-water mark (mirrors _prepare_chunk's)."""
    return ms.engines[b].cached + prep["n_real"] + max_new
