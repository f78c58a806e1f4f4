"""Device mesh and data-parallel shardings.

TPU-native replacement of the reference's DDP/NCCL layer
(/root/reference/wekws/bin/train.py:103-105,190-195 and the rank-based
list slicing in dataset.py:91-97): a 1-D ``('data',)`` mesh over all
chips, parameters replicated, batches sharded on axis 0.  Gradient
all-reduce is inserted by XLA when the jitted train step consumes a
sharded batch and produces replicated grads — it rides ICI within a
slice and DCN across hosts, no hand-written collectives.

Multi-host: call ``distributed_init()`` once per process (the jax
equivalent of ``dist.init_process_group``), then every process builds
the same global mesh from ``jax.devices()``.
"""

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host discovery (jax.distributed). No-op for single host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch arrays: sharded along dim 0."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Params / optimizer state: replicated everywhere."""
    return NamedSharding(mesh, P())


def pad_batch_to_multiple(
    batch: Dict[str, np.ndarray], multiple: int
) -> Dict[str, np.ndarray]:
    """Pad the batch dim to a device-count multiple, adding a ``valid``
    0/1 mask so padded rows can be excluded from metrics."""
    b = batch["waves"].shape[0]
    rem = (-b) % multiple
    out = dict(batch)
    if "valid" not in out:  # bucketed batches carry their own mask
        out["valid"] = np.ones((b,), np.float32)
    if rem == 0:
        return out
    for key, val in list(out.items()):
        if isinstance(val, np.ndarray) and val.ndim >= 1 and val.shape[0] == b:
            pad_width = [(0, rem)] + [(0, 0)] * (val.ndim - 1)
            out[key] = np.pad(val, pad_width)
        elif isinstance(val, list) and len(val) == b:
            out[key] = val + [val[-1]] * rem
    # padded rows must not produce NaNs: give them length >= 1 frame
    if "wave_lengths" in out:
        out["wave_lengths"][b:] = max(1, int(batch["wave_lengths"].min()))
    if "target_lengths" in out:
        out["target_lengths"][b:] = 1
    return out


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data"):
    """Device-put every array of the batch with batch-dim sharding."""
    sharding = data_sharding(mesh, axis)
    out = {}
    for key, val in batch.items():
        if isinstance(val, np.ndarray):
            out[key] = jax.device_put(val, sharding)
        else:
            out[key] = val
    return out


def make_global_batch(
    local_batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data"
):
    """Multi-host: assemble each process's local batch shard into global
    arrays sharded over the mesh (the DDP per-rank batch contract —
    every process calls this with ITS shard; jit then sees one global
    batch and XLA reduces gradients across hosts)."""
    sharding = data_sharding(mesh, axis)
    out = {}
    for key, val in local_batch.items():
        if isinstance(val, np.ndarray):
            out[key] = jax.make_array_from_process_local_data(sharding, val)
        else:
            out[key] = val
    return out
