"""Device mesh + sharding helpers (the framework's distributed backbone).

The reference has NO distributed execution (SURVEY.md section 2.2: single
ROS node, single-GPU torch, serial per-sample QP loop).  Here scaling is
native: a Mesh with a 'dp' axis shards the scenario batch; parameters are
replicated; XLA inserts psum for gradient reduction over ICI.  Multi-host
extends the same mesh over processes via jax.distributed (same code path).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Put every array in the pytree with its leading dim sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, r), tree)


def initialize_distributed():
    """Multi-host entry: call once per process before building the mesh
    (single-process environments no-op)."""
    try:
        jax.distributed.initialize()
    except Exception:
        pass
