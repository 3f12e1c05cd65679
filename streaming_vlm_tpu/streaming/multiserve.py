"""Multi-client serving front-end over MultiStreamEngine's dynamic lanes.

Turns the lockstep batched engine into an asynchronous serving API: clients
attach whenever they like, submit chunks at their own pace, and read
generated ids back; the server drives batched rounds in which lanes with a
pending chunk are active and the rest ride along idle (state frozen —
multistream.py). This is the deployment shape the reference cannot express
at all: its serving unit is one process owning one GPU for one stream
(reference inference.py:72-74 `device_map="cuda"`, one model per
`streaming_inference` call); N viewers cost N GPUs. Here N viewers share
one chip's weight reads (BENCH_MULTISTREAM_r03.json: 6 concurrent
real-time 3B streams on one v5e chip at 1.65x the reference's single-GPU
headline).

Design notes (TPU-idiomatic serving):
  * shapes are static — a lane is active or idle, the executable is the
    same; attach/detach never recompiles;
  * the round loop is HOST logic only: queue scans, one batched dispatch,
    one batched fetch. No per-client device traffic (the r3 lesson:
    per-lane device ops cost one tunnel/PCIe round-trip each);
  * vision runs per active lane through the single-grid tower executable
    (measured 15x faster than a concatenated multi-grid encode at B=4);
  * clients own their chunk clocks: commit indices are per-client, so a
    freshly attached client starts at chunk 0 mid-flight of others.
"""

from __future__ import annotations

import itertools
import queue
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .engine import _bucket
from .multistream import MultiStreamEngine
from .segments import VISION

__all__ = ["MultiStreamServer", "StreamClient"]

# Sentinel pushed into every client's result queue when the server
# fail-stops: wakes any get() blocked with no timeout so it raises the
# server error instead of hanging forever.
_FAILED = object()


def _is_device_fault(exc: BaseException) -> bool:
    """Recoverable device-runtime faults, as opposed to logic errors (which
    must fail-stop: replaying a logic error would just re-raise it). The
    axon/XLA runtime surfaces tunnel faults as XlaRuntimeError with a gRPC
    status keyword; tests inject a RuntimeError carrying the same keyword."""
    if type(exc).__name__ == "XlaRuntimeError":
        return True
    return isinstance(exc, RuntimeError) and any(
        k in str(exc) for k in ("UNAVAILABLE", "INTERNAL", "DATA_LOSS")
    )


class _ClientError:
    """One rejected chunk, delivered through the owning client's result
    queue: get() raises the wrapped error ONCE and the client stays usable
    (unlike _FAILED, which is server-fatal and re-arms)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class StreamClient:
    """Handle for one attached stream: submit chunks, read results.

    `lane` is None while the client is PARKED (oversubscribed server,
    stream state held as a host snapshot); the scheduler restores it into
    a lane when its next chunk is picked up."""

    def __init__(self, server: "MultiStreamServer", lane: Optional[int]):
        self._server = server
        self.lane = lane
        self.chunk_index = 0  # this client's own chunk clock
        self._pending: "queue.Queue[Dict[str, Any]]" = queue.Queue()
        self._results: "queue.Queue[Tuple[int, np.ndarray]]" = queue.Queue()
        self.closed = False
        self._parked: Optional[Dict[str, Any]] = None  # host snapshot
        self._seed: Optional[int] = None  # sampling seed until first placement
        self._last_round = -1  # LRU clock for eviction choice
        # auto-recovery state (server.auto_recover): host snapshot at the
        # last checkpointed chunk boundary + the admitted work since it —
        # restore + deterministic replay reconstructs the lane bitwise
        self._recovery_snapshot: Optional[Dict[str, Any]] = None
        self._journal: List[Dict[str, Any]] = []

    def submit(
        self,
        chunk_segs: List,
        *,
        pixel_patches: Optional[np.ndarray] = None,  # [S, patch_dim]
        grid_thw: Optional[Tuple[int, int, int]] = None,
        max_new: Optional[int] = None,  # per-chunk decode budget (e.g. a
        # qa-injected chunk wanting 64 tokens); other clients in the same
        # round keep their own budgets (per-lane n_max in the batched step)
    ) -> None:
        """Enqueue one chunk (segments + optional vision patches). The
        server picks it up on its next round. Malformed submissions raise
        HERE, in the caller's thread — a bad chunk must never reach the
        round loop, where a failure is fatal for every client (fail-stop,
        see MultiStreamServer.error)."""
        assert not self.closed, "client closed"
        self._server._check_alive()
        st = self._server.engine.stream
        if max_new is not None and int(max_new) < 1:
            # the batched step asserts every lane's budget >= 1; an
            # unvalidated 0 here would fail-stop the whole server mid-round
            raise ValueError(
                f"max_new must be >= 1 (got {max_new}); omit it for the "
                f"default ({st.max_tokens_per_chunk})"
            )
        n_tok = sum(len(s.ids) for s in chunk_segs)
        if n_tok > max(st.prefill_buckets):
            raise ValueError(
                f"chunk has {n_tok} tokens, above the largest prefill "
                f"bucket {max(st.prefill_buckets)}; split the chunk or "
                f"serve with larger prefill_buckets"
            )
        n_pad = sum(len(s.ids) for s in chunk_segs if s.kind == VISION)
        if pixel_patches is None:
            if n_pad:
                raise ValueError(
                    f"chunk carries {n_pad} video_pad tokens but no "
                    f"pixel_patches; the model would attend to garbage "
                    f"placeholder embeddings"
                )
        else:
            assert grid_thw is not None
            cfg = self._server.engine.cfg
            vc = cfg.vision
            t_g, h_g, w_g = (int(x) for x in grid_thw)
            # geometry the vision tower would reject INSIDE the round loop
            # (vision_geometry reshapes (h, w) into merge-size blocks): a
            # malformed grid must be this client's error, not a server-
            # fatal one
            if (
                t_g < 1
                or h_g < vc.spatial_merge_size
                or w_g < vc.spatial_merge_size
                or h_g % vc.spatial_merge_size
                or w_g % vc.spatial_merge_size
            ):
                raise ValueError(
                    f"grid {tuple(grid_thw)} is not a valid vision grid: t "
                    f">= 1 and h, w must be positive multiples of "
                    f"spatial_merge_size={vc.spatial_merge_size}"
                )
            patch_dim = (
                vc.in_channels * vc.temporal_patch_size * vc.patch_size**2
            )
            if (
                getattr(pixel_patches, "ndim", 0) != 2
                or int(pixel_patches.shape[1]) != patch_dim
            ):
                raise ValueError(
                    f"pixel_patches must be [n_patches, {patch_dim}] "
                    f"(in_channels*temporal_patch_size*patch_size^2); got "
                    f"shape {getattr(pixel_patches, 'shape', None)}"
                )
            n_patches = t_g * h_g * w_g
            if int(pixel_patches.shape[0]) != n_patches:
                raise ValueError(
                    f"pixel_patches has {pixel_patches.shape[0]} rows but "
                    f"grid {tuple(grid_thw)} implies {n_patches}"
                )
            n_vis = n_patches // cfg.vision.spatial_merge_unit
            if n_pad != n_vis:
                raise ValueError(
                    f"chunk carries {n_pad} video_pad tokens but grid "
                    f"{tuple(grid_thw)} implies {n_vis}"
                )
        self._pending.put(
            {
                "segs": chunk_segs,
                "patches": pixel_patches,
                "grid": grid_thw,
                "max_new": max_new,
                # arrival order across ALL clients: the scheduler serves
                # oldest head-of-queue first (FIFO over chunks, so no
                # client starves while lanes are contended)
                "ticket": next(self._server._ticket),
            }
        )
        self._server._wake.set()

    def get(self, timeout: Optional[float] = None) -> Tuple[int, np.ndarray]:
        """Next (chunk_index, generated ids incl. eos). Raises queue.Empty
        on timeout, or RuntimeError (chaining the original exception) if the
        server has fail-stopped — a blocked get() is woken, never hangs."""
        item = self._results.get(timeout=timeout)
        if item is _FAILED:
            # re-arm so every subsequent/concurrent get() also raises
            self._results.put(_FAILED)
            self._server._check_alive()
            raise RuntimeError("server fail-stopped")  # unreachable guard
        if isinstance(item, _ClientError):
            # one rejected chunk (round-time admission): raised once, in
            # submit order; the client and server remain live
            raise item.exc
        return item

    def snapshot(self) -> Dict[str, Any]:
        """Serialize this client's live stream (streaming/snapshot.py) —
        typically right before close(), to migrate the stream to another
        server/process/chip (`attach(snapshot=...)` there) or persist it
        (snapshot.save_snapshot). Serialises against in-flight rounds; any
        not-yet-processed submits are NOT part of the snapshot — drain
        results first."""
        assert not self.closed, "client closed"
        return self._server._snapshot(self)

    def close(self) -> None:
        """Detach: the lane becomes free for the next client. Pending
        chunks not yet processed are dropped."""
        self._server._detach(self)


class MultiStreamServer:
    """Round scheduler multiplexing up to `engine.n` clients on one chip.

    Rounds are driven either manually (`run_round_once`, deterministic —
    what the equivalence tests use) or by a background thread
    (`start`/`stop`). Clients may stream at DIFFERENT video resolutions:
    each lane encodes through its own grid's tower executable and the
    batched step pads vision-token counts to the round's max
    (multistream.py mixed-grid rounds).

    With `max_clients` > engine.n the server is OVERSUBSCRIBED: up to
    max_clients concurrent streams share n device lanes, with idle
    streams' KV paged out to host snapshots (the vLLM-swap idea, made
    bitwise-exact here by the chunk-boundary snapshot format). Scheduling
    is FIFO over submitted chunks with sticky lane residency; paging a
    stream in/out never recompiles anything (static shapes) and never
    changes its outputs (tests/test_multiserve.py oversubscription
    equivalence)."""

    def __init__(
        self,
        engine: MultiStreamEngine,
        *,
        end_bias: int = 2,
        max_clients: Optional[int] = None,
        engine_factory=None,
        snapshot_every: int = 16,
        max_recoveries: int = 3,
    ):
        """`max_clients` > engine.n enables OVERSUBSCRIPTION: clients beyond
        the device lane count are parked as host snapshots (streaming/
        snapshot.py — KV prefix + table + rng, chunk-boundary exact) and the
        scheduler pages them into lanes when their next chunk comes up,
        evicting the least-recently-active idle resident. Steady state with
        <= n concurrently-chatty clients never swaps; each swap costs one
        lane-KV device->host + host->device copy. Default (None) keeps the
        strict behavior: at most engine.n clients, attach raises beyond.

        `engine_factory` (a zero-arg callable returning a compatible
        MultiStreamEngine) enables AUTOMATIC FAULT RECOVERY: on a device-
        runtime fault mid-round (the documented tunnel/XLA fault class —
        _is_device_fault) the server discards the engine, builds a fresh one
        (the factory may rotate prefill buckets per the fault playbook),
        restores every resident lane from its periodic host snapshot (taken
        every `snapshot_every` delivered chunks) and REPLAYS the journaled
        chunks since — deterministic, so the reconstructed state is bitwise
        the pre-fault state (solo==lane and idle-freeze equivalences,
        tests/test_multistream.py). Chunks in flight at the fault that were
        not yet delivered are re-queued at the front, so NO submitted chunk
        is lost. After `max_recoveries` faults the server fail-stops as
        before. Non-fault exceptions always fail-stop (replaying a logic
        error would just re-raise it)."""
        self.engine = engine
        self.engine_factory = engine_factory
        self.auto_recover = engine_factory is not None
        self.snapshot_every = snapshot_every
        self.max_recoveries = max_recoveries
        self.recoveries = 0  # successful recoveries (observability/tests)
        self._inflight: Optional[List[List[Any]]] = None  # [client, work, delivered]
        self.end_bias = end_bias
        self.max_clients = engine.n if max_clients is None else max_clients
        self._lanes: List[Optional[StreamClient]] = [None] * engine.n
        self._all: List[StreamClient] = []
        self._ticket = itertools.count()
        self._round = 0  # LRU clock
        self.swaps = 0  # evictions performed (observability/tests)
        self._lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._wake = threading.Event()
        # FAIL-STOP: first exception out of a round. A mid-round failure can
        # leave lane accounting / engine state inconsistent, so the server
        # refuses all further work instead of limping (the reference's
        # single-process-per-stream shape gets this for free; a batched
        # server must make one stream's blast radius explicit). Submit-time
        # validation (StreamClient.submit) keeps per-client mistakes out of
        # this path entirely.
        self.error: Optional[BaseException] = None

    def _check_alive(self) -> None:
        if self.error is not None:
            raise RuntimeError(
                "MultiStreamServer has fail-stopped after an error in a "
                "batched round; state may be inconsistent — attach clients "
                "to a fresh server (snapshots taken before the failure "
                "remain valid)"
            ) from self.error

    def _fail(self, exc: BaseException) -> None:
        """Record the first round failure and wake every client: any get()
        blocked without a timeout must raise, not hang. Caller may or may
        not hold the lock — only queue puts + flag writes here, both
        thread-safe."""
        if self.error is None:
            self.error = exc
        self._stop.set()
        for c in list(self._all):
            c._results.put(_FAILED)

    # ------------------------------------------------------------- lifecycle
    def attach(
        self,
        seed: Optional[int] = None,
        snapshot: Optional[Dict[str, Any]] = None,
    ) -> StreamClient:
        """Admit a new client. With a free lane it is placed immediately
        (resets the lane's host state; no recompile, no disturbance to live
        lanes); on an oversubscribed server with all lanes busy it is PARKED
        and placed on first scheduling. With `snapshot` (from StreamClient.
        snapshot / StreamingEngine.snapshot / snapshot.load_snapshot) the
        client RESUMES that stream mid-flight — live migration between
        servers, processes or chips — and its chunk clock continues at the
        snapshot's chunk_index. Raises RuntimeError at max_clients —
        callers queue or scale out. An incompatible snapshot raises
        ValueError HERE: on an oversubscribed server placement happens
        lazily inside a batched round, where a restore failure would
        fail-stop every client."""
        self._check_alive()
        if snapshot is not None:
            from .snapshot import validate_snapshot

            validate_snapshot(snapshot, self.engine.stream)
        with self._lock:
            if len(self._all) >= self.max_clients:
                raise RuntimeError(
                    f"all {self.max_clients} client slots taken "
                    f"({self.engine.n} lanes); detach a client, raise "
                    f"max_clients, or serve with a larger n_streams"
                )
            client = StreamClient(self, None)
            client._seed = seed
            if snapshot is not None:
                client._parked = snapshot
                client.chunk_index = int(snapshot["chunk_index"])
            lane = self._free_lane()
            if lane is not None:
                self._place(client, lane)
            self._all.append(client)
            return client

    def _free_lane(self) -> Optional[int]:
        for b, c in enumerate(self._lanes):
            if c is None:
                return b
        return None

    def _place(self, client: StreamClient, lane: int) -> None:
        """Materialise a client's stream into lane `lane` (caller holds the
        lock and guarantees the lane is free)."""
        if client._parked is not None:
            self.engine.restore_lane(lane, client._parked)
            if self.auto_recover:
                # the parking snapshot IS the current state — journal empty
                client._recovery_snapshot = client._parked
                client._journal.clear()
            client._parked = None
        else:
            self.engine.reset_lane(lane, seed=client._seed)
            if self.auto_recover:
                client._recovery_snapshot = self.engine.snapshot_lane(lane)
                client._journal.clear()
        client.lane = lane
        self._lanes[lane] = client

    def _evict(self, client: StreamClient) -> None:
        """Page a resident client out to a host snapshot, freeing its lane.
        Always at a chunk boundary: rounds end with commit_assistant, and
        eviction happens only between rounds."""
        client._parked = self.engine.snapshot_lane(client.lane)
        if self.auto_recover:
            client._recovery_snapshot = client._parked
            client._journal.clear()
        self._lanes[client.lane] = None
        client.lane = None
        self.swaps += 1

    def _snapshot(self, client: StreamClient) -> Dict[str, Any]:
        with self._lock:
            # checked INSIDE the lock: with the background round thread, a
            # just-submitted chunk could otherwise be mid-round (popped from
            # _pending) and land in the snapshot while its result is never
            # drained — replaying it after migration would duplicate a turn
            assert client._pending.empty() and client._results.empty(), (
                "snapshot with submitted chunks pending or results undrained;"
                " drain get() first"
            )
            if client.lane is None:
                assert client._parked is not None, (
                    "snapshot of a never-scheduled client with no snapshot "
                    "state; submit a chunk first or attach(snapshot=...)"
                )
                # top-level copy so the caller's dict survives this client
                # being placed later (restore never mutates the arrays)
                return dict(client._parked)
            return self.engine.snapshot_lane(client.lane)

    def _detach(self, client: StreamClient) -> None:
        with self._lock:
            if client.closed:
                # double close(): the lane may already belong to a NEW
                # client (attach reuses freed lanes) — freeing it again
                # would wipe that client's live stream
                return
            client.closed = True
            if client.lane is not None:
                # client.lane is left as a historical value on the closed
                # handle; the lane map below is what frees the lane
                self._lanes[client.lane] = None
            client._parked = None
            client._recovery_snapshot = None
            client._journal.clear()
            if client in self._all:
                self._all.remove(client)

    def _admission_error(
        self, client: StreamClient, w: Dict[str, Any]
    ) -> Optional[ValueError]:
        """Tail-aware admission against the lane's LIVE state. submit() can
        only bound a chunk statically; the lane may carry an uncached tail
        (e.g. a force-appended <|im_end|> from a budget-capped round,
        engine.finish_chunk) that re-prefills WITH this chunk — so a chunk
        at exactly the largest bucket can still overflow inside the round.
        Mirrors _prepare_chunk's n_real and the batched round's per-lane
        high-water check; returns the error to deliver to this client, or
        None to admit. Runs under the server lock with the client placed
        and the round's eviction already applied (_round_locked evicts
        first, so `cached` here is the post-evict occupancy the engine's
        own pre-pass will certify — checking the pre-evict value would
        spuriously reject steady-state chunks whenever kv_capacity is
        sized to the post-evict high-water, which is exactly what the
        engine's capacity errors tell operators to size it to).

        This check uses the lane's OWN bucket and budget — what the chunk
        needs if it were alone. Cross-lane pressure (the round's SHARED
        bucket / round-max budget) is handled by _shared_admission."""
        st = self.engine.stream
        e = self.engine.engines[client.lane]
        n_real = e.uncached_tail + sum(len(s.ids) for s in w["segs"])
        try:
            t_pad = _bucket(n_real, st.prefill_buckets)
        except ValueError as exc:
            return exc
        mn = w["max_new"]
        max_new = st.max_tokens_per_chunk if mn is None else int(mn)
        hw = max(e.cached + t_pad, e.cached + n_real + max_new)
        if hw > st.kv_capacity:
            return ValueError(
                f"chunk of {n_real} tokens (incl. {e.uncached_tail} uncached "
                f"tail) at cached={e.cached} would overflow kv_capacity "
                f"{st.kv_capacity}; shorten the chunk or serve with a "
                f"larger kv_capacity"
            )
        return None

    def _shared_admission(
        self,
        work: List[Optional[Dict[str, Any]]],
        admitted: List[StreamClient],
    ) -> List[StreamClient]:
        """Round-shared capacity admission. Mirrors the batched round's
        atomic pre-pass (MultiStreamEngine.round_capacity_error): every lane
        — idle residents included — pays the round's SHARED prefill bucket
        (the step's static shape is the max over lanes) and the SHARED
        decode-scan length (round-max budget). A chunk that passed its own
        per-lane check can therefore still sink the round: a qa-injected
        1024-bucket chunk on lane B overflows near-capacity lane A, which
        lane A could never have screened at submit time.

        Resolution: while any lane overflows, reject the admitted chunk
        exerting the binding shared pressure (largest own-bucket chunk if
        the shared-bucket term binds, largest-budget chunk otherwise) with
        a _ClientError to ITS client, and re-evaluate. Terminates (one
        chunk removed per iteration); with everything rejected the round
        is simply skipped — the server never fail-stops on a capacity
        conflict between individually-valid clients."""
        st = self.engine.stream
        C = st.kv_capacity
        engines = self.engine.engines
        while admitted:
            n_reals = [
                e.uncached_tail
                + (
                    0
                    if work[b] is None
                    else sum(len(s.ids) for s in work[b]["segs"])
                )
                for b, e in enumerate(engines)
            ]
            buckets = [_bucket(n, st.prefill_buckets) for n in n_reals]
            t_shared = max(buckets)
            # idle lanes ride the round at the DEFAULT budget, exactly as
            # process_round_async fills None entries of a budgets list
            budgets = [
                st.max_tokens_per_chunk
                if work[b] is None or work[b]["max_new"] is None
                else int(work[b]["max_new"])
                for b in range(self.engine.n)
            ]
            mx = max(budgets)
            over = next(
                (
                    b
                    for b, e in enumerate(engines)
                    if max(e.cached + t_shared, e.cached + n_reals[b] + mx)
                    > C
                ),
                None,
            )
            if over is None:
                return admitted
            e = engines[over]
            if e.cached + t_shared >= e.cached + n_reals[over] + mx:
                victim = max(admitted, key=lambda c: buckets[c.lane])
                cause = f"shared prefill bucket {t_shared}"
            else:
                victim = max(admitted, key=lambda c: budgets[c.lane])
                cause = f"round decode budget {mx}"
            victim._results.put(
                _ClientError(
                    ValueError(
                        f"chunk rejected: joining this batched round would "
                        f"impose {cause} on every lane, overflowing "
                        f"kv_capacity {C} at lane {over} "
                        f"(cached={e.cached}); raise kv_capacity, lower "
                        f"the chunk's size/max_new, or align stream "
                        f"protocols across clients"
                    )
                )
            )
            work[victim.lane] = None
            admitted = [c for c in admitted if c is not victim]
        return admitted

    # ----------------------------------------------------------------- round
    def run_round_once(self) -> int:
        """Collect at most one pending chunk per client and run ONE batched
        round. Returns the number of active lanes (0 = nothing to do).
        Holds the server lock for the whole round: attach/detach from other
        threads serialise against in-flight rounds (a reset mid-round would
        corrupt lane accounting). Any exception fail-stops the server (see
        `error`) and re-raises."""
        self._check_alive()
        with self._lock:
            try:
                return self._round_locked()
            except BaseException as exc:
                if (
                    self.auto_recover
                    and _is_device_fault(exc)
                    and self.recoveries < self.max_recoveries
                ):
                    try:
                        self._recover()
                    except BaseException as rexc:
                        rexc.__cause__ = exc
                        self._fail(rexc)
                        raise
                    self.recoveries += 1
                    # re-queued chunks run on the next round
                    return 0
                self._fail(exc)
                raise

    def _round_locked(self) -> int:
        # -- schedule: serve the oldest-submitted chunks first (FIFO over
        # head-of-queue tickets), at most one chunk per client per round
        ready = [c for c in self._all if not c._pending.empty()]
        if not ready:
            return 0
        # .queue[0] peek is safe: items are only ever removed under this
        # lock, and we just saw the queue non-empty
        ready.sort(key=lambda c: c._pending.queue[0]["ticket"])
        chosen = ready[: self.engine.n]

        # -- place parked chosen clients: free lanes first, then page out
        # resident clients that did NOT make this round (least-recently
        # active first); residency is sticky, so <= n chatty clients never
        # swap
        incoming = [c for c in chosen if c.lane is None]
        if incoming:
            chosen_set = set(map(id, chosen))
            victims = sorted(
                (
                    c
                    for c in self._lanes
                    if c is not None and id(c) not in chosen_set
                ),
                key=lambda c: c._last_round,
            )
            for c in incoming:
                lane = self._free_lane()
                if lane is None:
                    self._evict(victims.pop(0))
                    lane = self._free_lane()
                self._place(c, lane)

        self._round += 1
        # evict FIRST (idempotent — the engine's round re-runs it as a
        # no-op): admission must judge POST-evict occupancy, the same
        # occupancy the batched round's own capacity pre-pass certifies.
        self.engine.evict_round()
        work: List[Optional[Dict[str, Any]]] = [None] * self.engine.n
        admitted: List[StreamClient] = []
        for c in chosen:
            w = c._pending.get_nowait()
            exc = self._admission_error(c, w)
            if exc is not None:
                # reject THIS chunk to THIS client; the round (and any
                # later chunks this client already queued) goes on
                c._results.put(_ClientError(exc))
                continue
            work[c.lane] = w
            admitted.append(c)
            c._last_round = self._round
        # cross-lane admission: the batched step sizes EVERY lane by the
        # round's shared bucket and round-max decode budget, so a set of
        # individually-valid chunks can still overflow a lane (even an
        # idle resident one). Reject offending chunks to their own
        # clients until the round fits — never fail-stop the server over
        # a per-client capacity conflict.
        admitted = self._shared_admission(work, admitted)
        if not admitted:
            return 0
        clients: List[Optional[StreamClient]] = list(self._lanes)
        n_active = len(admitted)
        # recovery bookkeeping: everything admitted into this round, with a
        # delivered flag — on a device fault, delivered chunks replay from
        # the journal, undelivered ones re-queue (nothing is lost)
        self._inflight = [[c, work[c.lane], False] for c in admitted]
        by_lane = {entry[0].lane: entry for entry in self._inflight}

        # per-lane grids: clients stream at whatever resolution they like;
        # each lane's chunk encodes through its own single-grid tower
        # executable and the batched step pads vision counts to the round's
        # max (multistream.py mixed-grid round)
        grids = [None if w is None else w["grid"] for w in work]
        patches = [None if w is None else w["patches"] for w in work]
        ve = None
        if any(p is not None for p in patches):
            ve = self.engine.encode_round_mixed(patches, grids)

        segs = [None if w is None else w["segs"] for w in work]
        budgets = [None if w is None else w.get("max_new") for w in work]
        outs = self.engine.process_round(
            segs,
            vis_embeds=ve,
            grid_thw=grids if any(g is not None for g in grids) else None,
            max_new=(
                budgets if any(m is not None for m in budgets) else None
            ),
        )
        for b, (c, out) in enumerate(zip(clients, outs)):
            if out is None or c is None:
                continue
            gen, _n = out
            self.engine.engines[b].commit_assistant(
                gen, self.end_bias, c.chunk_index
            )
            c._results.put((c.chunk_index, np.asarray(gen)))
            c.chunk_index += 1
            if b in by_lane:
                by_lane[b][2] = True  # delivered — replays via the journal
        if self.auto_recover:
            # journal BEFORE clearing _inflight, so a fault inside the
            # snapshot refresh below cannot double-journal delivered work
            for c, w, delivered in self._inflight:
                if delivered:
                    c._journal.append(w)
            self._inflight = None
            for c in admitted:
                if len(c._journal) >= self.snapshot_every:
                    c._recovery_snapshot = self.engine.snapshot_lane(c.lane)
                    c._journal.clear()
        else:
            self._inflight = None
        return n_active

    # ------------------------------------------------------------ recovery
    def _recover(self) -> None:
        """Rebuild the engine after a device fault and reconstruct every
        lane bitwise (caller holds the lock). Undelivered in-flight chunks
        re-queue at the FRONT of their clients' queues; delivered ones are
        already in the journal and replay into state. Deterministic replay
        (sampling rng rides the snapshot) makes the reconstruction exact —
        the same solo==lane / idle-freeze equivalences the snapshot tests
        assert."""
        inflight = self._inflight or []
        self._inflight = None
        for c, w, delivered in inflight:
            if delivered:
                c._journal.append(w)
            else:
                # Queue.queue is a deque; mutation is safe under our lock.
                # One entry per client per round, so front-insertion keeps
                # each client's ticket order intact.
                c._pending.queue.appendleft(w)
        self.engine = self.engine_factory()
        assert self.engine.n == len(self._lanes), (
            "engine_factory must preserve the lane count"
        )
        for c in self._all:
            if c.lane is None:
                continue  # parked — state already lives as a host snapshot
            assert c._recovery_snapshot is not None
            self.engine.restore_lane(c.lane, c._recovery_snapshot)
            for j, w in enumerate(c._journal):
                self._replay_one(c, c.chunk_index - len(c._journal) + j, w)
            # checkpoint the reconstructed state: a second fault replays
            # nothing
            c._recovery_snapshot = self.engine.snapshot_lane(c.lane)
            c._journal.clear()

    def _replay_one(self, client: StreamClient, rnd: int, w: Dict[str, Any]) -> None:
        """Re-run one journaled chunk for one lane (others idle). The idle
        riders are either still-reset lanes (harmless free-run) or already-
        restored ones, whose only state change — the uncached tail becoming
        cached post-evict — is exactly what their next real chunk would do
        (the tested idle-freeze bitwise property)."""
        n = self.engine.n
        segs: List[Optional[Any]] = [None] * n
        grids: List[Optional[Any]] = [None] * n
        patches: List[Optional[Any]] = [None] * n
        budgets: List[Optional[Any]] = [None] * n
        b = client.lane
        segs[b], grids[b], patches[b] = w["segs"], w["grid"], w["patches"]
        budgets[b] = w.get("max_new")
        self.engine.evict_round()
        ve = (
            self.engine.encode_round_mixed(patches, grids)
            if patches[b] is not None
            else None
        )
        outs = self.engine.process_round(
            segs,
            vis_embeds=ve,
            grid_thw=grids if grids[b] is not None else None,
            max_new=budgets if budgets[b] is not None else None,
        )
        gen, _n = outs[b]
        self.engine.engines[b].commit_assistant(gen, self.end_bias, rnd)

    # ------------------------------------------------------------ background
    def start(self, poll_s: float = 0.002) -> None:
        """Drive rounds on a background thread until stop()."""
        assert self._thread is None

        def loop():
            while not self._stop.is_set():
                try:
                    n = self.run_round_once()
                except BaseException:
                    # already recorded + clients woken by run_round_once's
                    # _fail; the thread exits instead of spinning on a dead
                    # server
                    return
                if n == 0:
                    self._wake.wait(timeout=poll_s)
                    self._wake.clear()

        self._stop.clear()
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._thread is not None:
            self._stop.set()
            self._wake.set()
            self._thread.join()
            self._thread = None
