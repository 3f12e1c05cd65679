"""Multi-host / multi-slice initialisation.

Replaces the reference's torchrun/NCCL layer (scripts/sft_stage_1.sh:44-45:
torchrun --standalone --nproc_per_node=8 + TORCH_NCCL_HEARTBEAT_TIMEOUT_SEC).
On TPU pods, `jax.distributed.initialize` wires hosts together; intra-slice
collectives ride ICI, inter-slice DCN. Meshes should put the fast-changing
axes (model/tensor) on ICI and data on DCN.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise multi-host JAX. On Cloud TPU the arguments are discovered
    from the metadata server; elsewhere pass them (or set JAX_COORDINATOR_*)."""
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs = dict(
            coordinator_address=coordinator_address
            or os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=num_processes
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    jax.distributed.initialize(**kwargs)


def make_slice_mesh(
    model_parallel: int = 4,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """('data', 'model') mesh over all global devices with the model axis kept
    inside a slice (ICI) — `mesh_utils.create_device_mesh` handles physical
    placement so the inner axis maps to the torus."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n = jax.device_count()
    assert n % model_parallel == 0, (n, model_parallel)
    devices = mesh_utils.create_device_mesh((n // model_parallel, model_parallel))
    return Mesh(devices, (data_axis, model_axis))


def make_multislice_mesh(
    num_slices: int,
    model_parallel: int,
    devices=None,
    axes=("dcn", "data", "model"),
):
    """('dcn', 'data', 'model') mesh for multi-slice pods: the outermost axis
    crosses slices (collectives ride DCN), data+model stay inside a slice
    (ICI). Parameter rules (parallel/mesh.py) only name data/model, so params
    replicate across slices and gradient all-reduces span dcn — the
    multi-slice data-parallel layout replacing the reference's multi-node
    torchrun (sft_stage_1.sh:44-45). Devices are ordered by slice_index so
    rows of the mesh are physically slice-local."""
    import numpy as np
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % num_slices == 0, (n, num_slices)
    per = n // num_slices
    assert per % model_parallel == 0, (per, model_parallel)
    devices.sort(key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
    dev = np.asarray(devices).reshape(
        num_slices, per // model_parallel, model_parallel
    )
    return Mesh(dev, axes)


def batch_spec(mesh) -> "object":
    """PartitionSpec for the batch dim: spans every data-like axis present
    (('dcn','data') on multi-slice meshes, ('data',) otherwise)."""
    from jax.sharding import PartitionSpec as P

    axes = tuple(a for a in ("dcn", "data") if a in mesh.shape)
    return P(axes if len(axes) > 1 else (axes[0] if axes else None))
