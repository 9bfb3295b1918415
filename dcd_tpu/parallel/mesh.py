"""Device mesh + sharding helpers.

Replaces the reference's NCCL/DDP machinery (``DGDE/engine/launch.py:23-89``,
``utils/comm.py``) with a ``jax.sharding.Mesh``:

* data parallelism = batch sharded over the ``data`` mesh axis; gradient
  all-reduce is inserted by XLA from the jitted loss (DDP's allreduce hook,
  ``plain_train_net.py:59-62``, has no explicit equivalent — the psum falls
  out of the global-batch loss mean).
* SyncBatchNorm = batch-norm moments computed over the *global* (sharded)
  batch axis under jit — XLA lowers the mean/variance to cross-replica
  collectives, which is exactly SyncBN.
* multi-host: ``jax.distributed.initialize`` + the same mesh over all
  processes' devices (one python process per host).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (reference: mp.spawn + NCCL init_process_group,
    engine/launch.py:50-68). No-op for single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place a host batch onto the mesh, sharded along the leading dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
