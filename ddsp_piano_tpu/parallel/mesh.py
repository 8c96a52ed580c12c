"""Device mesh + sharding helpers (data parallelism over ICI).

The reference hides distribution behind tf.distribute strategies
(train_util.get_strategy / Trainer.distribute_dataset; SURVEY §2.9). The
TPU-native equivalent: a jax.sharding.Mesh with a 'data' axis, batches
sharded over it, parameters replicated, and XLA/GSPMD inserting the gradient
all-reduce over ICI automatically inside the jitted train step.

The model's only large parallel axis beyond batch is the polyphony fold
(n_synths * batch); because the fold is a reshape of (voice, batch), data
sharding of the batch axis also shards every folded tensor — no separate
voice axis is needed for the shipped model sizes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None,
             axis_name: str = 'data') -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"Requested {n_devices} devices, have "
                         f"{len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def get_mesh_for_batch(batch_size: int, n_devices: Optional[int] = None,
                       axis_name: str = 'data') -> Mesh:
    """Largest mesh whose size divides the batch (data-parallel sharding
    requires batch % n_devices == 0; tf.distribute tolerated uneven splits,
    GSPMD does not)."""
    if jax.process_count() > 1:
        # Every process's devices must participate in a multi-process mesh
        # (a subset mesh would leave some hosts' devices out of the
        # program, which GSPMD rejects at dispatch).
        if n_devices is not None and n_devices != len(jax.devices()):
            import warnings
            warnings.warn(
                f"--n_devices={n_devices} is ignored in multi-process runs: "
                f"all {len(jax.devices())} global devices must participate "
                f"in the mesh.", stacklevel=2)
        n = len(jax.devices())
        if batch_size % n != 0:
            raise ValueError(
                f"Global batch {batch_size} must divide over the "
                f"{n}-device multi-process mesh.")
        return get_mesh(n, axis_name)
    limit = n_devices if n_devices is not None else len(jax.devices())
    limit = min(limit, len(jax.devices()))
    n = max(d for d in range(1, limit + 1) if batch_size % d == 0)
    return get_mesh(n, axis_name)


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = 'data') -> dict:
    """Place a host batch dict onto the mesh, sharded along axis 0.

    Equivalent to the reference's AutoShardPolicy.DATA dataset distribution
    (data_pipeline.py:263-265).

    Single process: each value is the full global batch. Multi-process
    (``jax.process_count() > 1``): each value is this host's LOCAL shard —
    the per-host slice of the global batch — and the global jax.Array is
    assembled across processes (the per-host half of AutoShardPolicy.DATA;
    the reference gets this from tf.distribute's dataset sharding).
    """
    sharding = batch_sharding(mesh, axis_name)
    multiprocess = jax.process_count() > 1
    # Devices this host contributes to the mesh (== all local devices for
    # the full-slice meshes the CLIs build).
    n = (len([d for d in mesh.devices.flat
              if d.process_index == jax.process_index()])
         if multiprocess else mesh.devices.size)
    for k, v in batch.items():
        if not hasattr(v, 'shape') or not v.shape:
            raise ValueError(
                f"Batch entry {k!r} is a scalar / 0-d value and cannot be "
                f"sharded along a batch axis. Broadcast it to shape "
                f"(batch, ...) or keep it out of the sharded batch dict.")
        if v.shape[0] % n != 0:
            raise ValueError(
                f"Batch axis of {k!r} has size {v.shape[0]}, not divisible "
                f"by the {n} local mesh device(s). Pick a divisible batch "
                f"size or shrink the mesh (--n_devices/get_mesh_for_batch).")
    if multiprocess:
        return {k: jax.make_array_from_process_local_data(sharding,
                                                          np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Initialize JAX multi-host distribution over DCN.

    The multi-host analogue of the reference's TPUStrategy resolution
    (SURVEY §2.9): call once per host before device use; afterwards
    jax.devices() spans the full slice and get_mesh() builds a global
    data mesh. No-ops on a single host with no coordinator configured.
    """
    import jax

    if coordinator_address is None:
        import os
        coordinator_address = os.environ.get('JAX_COORDINATOR_ADDRESS')
    if coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of a globally-sharded batch (per-host data
    loading; the AutoShardPolicy.DATA equivalent across hosts)."""
    import jax

    if global_batch_size % jax.process_count() != 0:
        raise ValueError(
            f"Global batch {global_batch_size} must divide over "
            f"{jax.process_count()} processes.")
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def slice_local_batch(batch: dict) -> dict:
    """Take this host's slice of a batch dict every host loaded in full.

    For deterministic (validation/test) sweeps where each host reads the
    same global batches: slice axis 0 so shard_batch reassembles exactly
    the global batch. No-op on a single process.
    """
    import jax

    if jax.process_count() == 1:
        return batch
    first = next(iter(batch.values()))
    sl = local_batch_slice(first.shape[0])
    return {k: v[sl] for k, v in batch.items()}
