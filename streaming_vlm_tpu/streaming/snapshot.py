"""Live-stream snapshot / restore: serialize a mid-flight stream's full
state — the valid KV-arena prefix, the segment table, positions and host
accounting — so a stream can be checkpointed to disk, recovered after a
fault, or MIGRATED across processes/chips (including into or out of a
multi-stream lane, MultiStreamEngine.snapshot_lane/restore_lane).

This extends the serving layer beyond the reference, which keeps all
streaming state implicit in one process (torch DynamicCache + python locals
inside the inference loop, reference src/streaming_vlm/inference/
inference.py:181-522) and can only restart a stream from scratch.

Contract (tests/test_snapshot.py): restoring a snapshot and continuing the
stream produces EXACTLY the tokens the uninterrupted engine would have
produced — in shrink and append position modes, bf16 and int8 arenas,
greedy and sampled (the RNG key is part of the snapshot), across engine
instances, file round-trips, and solo <-> multi-stream-lane migrations.

What is snapshotted, and why it is sufficient:
  * arena slots [0, cached) of K/V/ids — slot i holds the KV of table token
    i (the core engine invariant), and slots beyond `cached` are scratch
    that the next chunk overwrites before reading;
  * the segment table (kind/ids/round/grid per segment) — the eviction
    policy's entire world; `_merged_ranges` is intra-`evict()` state and
    never crosses a chunk boundary (segments.py:356);
  * cached / uncached_tail / chunk_index — the slot accounting; tokens in
    the table but not the arena (forced <|im_end|>, teacher forcing)
    re-prefill from the table with the next chunk, exactly as they would
    have in the original process;
  * `_pos_host[:, :cached]` + `_next_pos` — append-mode per-slot positions
    (shrink mode recomputes positions from the table every chunk, but the
    mirror is cheap and keeping it unconditional avoids a mode fork);
  * the sampling RNG key — sampled continuations are deterministic.

Weights are NOT part of a snapshot (load them like the engine's own params);
geometry is validated on restore.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

SNAPSHOT_VERSION = 1


# ---------------------------------------------------------------------------
# arena prefix <-> numpy
# ---------------------------------------------------------------------------


def _slots_to_np(arena, n: int):
    """Fetch arena slots [0, n) (slot axis 1) as host numpy, preserving the
    representation (plain array or int8 {"q","s"} pytree)."""
    if isinstance(arena, dict):
        return {
            "q": np.asarray(arena["q"][:, :n]),
            "s": np.asarray(arena["s"][:, :n]),
        }
    return np.asarray(arena[:, :n])


def _np_geometry(prefix):
    """(L, Hkv, hd) of a snapshotted arena prefix."""
    a = prefix["q"] if isinstance(prefix, dict) else prefix
    return a.shape[0], a.shape[2], a.shape[3]


def _write_slots(arena, prefix, n: int):
    """Fresh arena with slots [0, n) set from a snapshot prefix, matching the
    existing arena's shapes, dtypes and shardings (restore is a cold path —
    one transfer per leaf)."""

    def one(leaf, p):
        full = jnp.zeros(leaf.shape, leaf.dtype)
        if n:
            full = full.at[:, :n].set(jnp.asarray(p).astype(leaf.dtype))
        return jax.device_put(full, leaf.sharding)

    return jax.tree_util.tree_map(one, arena, prefix)


# ---------------------------------------------------------------------------
# engine <-> snapshot dict
# ---------------------------------------------------------------------------


def snapshot_host(engine) -> Dict[str, Any]:
    """Host-side state of a StreamingEngine (everything but the arena)."""
    assert engine._inflight is None, "snapshot with a chunk in flight"
    return {
        "version": SNAPSHOT_VERSION,
        "kv_quant": engine.stream.kv_quant,
        "pos_mode": engine.stream.pos_mode,
        "all_text": engine.table.all_text,
        "cached": int(engine.cached),
        "uncached_tail": int(engine.uncached_tail),
        "chunk_index": int(engine.chunk_index),
        "next_pos": float(engine._next_pos),
        "rng": np.asarray(engine.rng),
        "pos": engine._pos_host[:, : engine.cached].copy(),
        "table": [
            {
                "kind": s.kind,
                "ids": np.asarray(s.ids, np.int32),
                "round": int(s.round),
                "grid_thw": (
                    tuple(int(x) for x in s.grid_thw)
                    if s.grid_thw is not None
                    else None
                ),
                "second_per_grid_t": float(s.second_per_grid_t),
            }
            for s in engine.table.segs
        ],
    }


def validate_snapshot(snap: Dict[str, Any], stream) -> None:
    """Check a snapshot is restorable onto an engine built from `stream`
    (StreamConfig) WITHOUT touching any engine. Raises ValueError naming the
    mismatch. Used by restore_host, and by serving front-ends at admission
    time — a bad snapshot must be rejected in the caller's thread, not
    inside a batched round where the failure fail-stops every client
    (multiserve.MultiStreamServer.attach)."""
    for key in ("version", "kv_quant", "pos_mode", "cached", "uncached_tail",
                "table", "rng", "pos", "chunk_index", "next_pos", "all_text"):
        if key not in snap:
            raise ValueError(f"snapshot is missing field {key!r}")
    if snap["version"] != SNAPSHOT_VERSION:
        raise ValueError(
            f"snapshot version {snap['version']!r} != {SNAPSHOT_VERSION!r}"
        )
    if stream.kv_quant != snap["kv_quant"]:
        raise ValueError(
            f"snapshot arena is kv_quant={snap['kv_quant']!r}, engine is "
            f"{stream.kv_quant!r}"
        )
    if stream.pos_mode != snap["pos_mode"]:
        raise ValueError(
            f"snapshot positions are pos_mode={snap['pos_mode']!r}, engine "
            f"is {stream.pos_mode!r}"
        )
    n = int(snap["cached"])
    if n > stream.kv_capacity:
        raise ValueError(
            f"snapshot holds {n} cached slots; engine kv_capacity="
            f"{stream.kv_capacity} cannot hold them"
        )
    total = sum(len(d["ids"]) for d in snap["table"])
    if total != n + int(snap["uncached_tail"]):
        raise ValueError(
            f"snapshot table holds {total} tokens but cached+uncached_tail="
            f"{n + int(snap['uncached_tail'])}"
        )


def restore_host(engine, snap: Dict[str, Any]) -> None:
    """Set a (freshly constructed) StreamingEngine's host state from a
    snapshot. The engine's stream config must agree on the invariant-bearing
    fields; capacity may differ (>= cached)."""
    from .segments import Seg, SegmentTable

    assert engine._inflight is None
    validate_snapshot(snap, engine.stream)
    st = engine.stream
    n = int(snap["cached"])
    table = SegmentTable(all_text=bool(snap["all_text"]))
    for d in snap["table"]:
        table.segs.append(
            Seg(
                kind=d["kind"],
                ids=np.asarray(d["ids"], np.int32),
                round=int(d["round"]),
                grid_thw=(
                    tuple(d["grid_thw"]) if d["grid_thw"] is not None else None
                ),
                second_per_grid_t=float(d["second_per_grid_t"]),
            )
        )
    assert table.total_len() == n + int(snap["uncached_tail"]), (
        table.total_len(),
        n,
        snap["uncached_tail"],
    )
    engine.table = table
    engine.cached = n
    engine.uncached_tail = int(snap["uncached_tail"])
    engine.chunk_index = int(snap["chunk_index"])
    engine._next_pos = float(snap["next_pos"])
    engine.rng = jnp.asarray(snap["rng"])
    engine._pos_host = np.zeros((3, st.kv_capacity), np.float32)
    engine._pos_host[:, :n] = snap["pos"]


# ---------------------------------------------------------------------------
# file round-trip (npz + json manifest; no pickle)
# ---------------------------------------------------------------------------


def save_snapshot(snap: Dict[str, Any], path: str) -> None:
    """Write a snapshot to one .npz. bf16 leaves upcast to f32 in the file
    (lossless) and cast back to the engine dtype on restore."""
    arrays: Dict[str, np.ndarray] = {
        "rng": np.asarray(snap["rng"]),
        "ids": np.asarray(snap["ids"], np.int32),
        "pos": np.asarray(snap["pos"], np.float32),
    }

    def put_arena(name, a):
        if isinstance(a, dict):
            arrays[f"{name}_q"] = np.asarray(a["q"], np.int8)
            arrays[f"{name}_s"] = np.asarray(a["s"], np.float32)
        else:
            arrays[name] = np.asarray(a, np.float32)

    put_arena("k", snap["k"])
    put_arena("v", snap["v"])

    seg_ids = (
        np.concatenate([d["ids"] for d in snap["table"]])
        if snap["table"]
        else np.zeros(0, np.int32)
    )
    arrays["seg_ids"] = seg_ids.astype(np.int32)
    manifest = {
        k: snap[k]
        for k in (
            "version",
            "kv_quant",
            "pos_mode",
            "all_text",
            "cached",
            "uncached_tail",
            "chunk_index",
            "next_pos",
        )
    }
    manifest["segs"] = [
        {
            "kind": d["kind"],
            "len": int(len(d["ids"])),
            "round": d["round"],
            "grid_thw": list(d["grid_thw"]) if d["grid_thw"] is not None else None,
            "second_per_grid_t": d["second_per_grid_t"],
        }
        for d in snap["table"]
    ]
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_snapshot(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        manifest = json.loads(bytes(z["manifest"].tobytes()).decode())
        snap: Dict[str, Any] = dict(manifest)
        snap.pop("segs")
        snap["rng"] = z["rng"]
        snap["ids"] = z["ids"]
        snap["pos"] = z["pos"]
        for name in ("k", "v"):
            if f"{name}_q" in z:
                snap[name] = {"q": z[f"{name}_q"], "s": z[f"{name}_s"]}
            else:
                snap[name] = z[name]
        table: List[Dict[str, Any]] = []
        off = 0
        for d in manifest["segs"]:
            table.append(
                {
                    "kind": d["kind"],
                    "ids": z["seg_ids"][off : off + d["len"]],
                    "round": d["round"],
                    "grid_thw": (
                        tuple(d["grid_thw"]) if d["grid_thw"] is not None else None
                    ),
                    "second_per_grid_t": d["second_per_grid_t"],
                }
            )
            off += d["len"]
        snap["table"] = table
    return snap
