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


def _looks_multiprocess() -> bool:
    """True when the environment carries an explicit multi-process launch
    config (coordinator address / process count), i.e. the user *intends*
    distributed execution and a silent single-host fallback would be wrong."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        return True
    n = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("NPROC")
    try:
        return int(n) > 1 if n is not None else False
    except ValueError:
        return False


def initialize_distributed():
    """Multi-host entry: call once per process before building the mesh.

    Environments with no distributed config no-op; a *configured*
    multi-process launch that fails to initialize raises — a misconfigured
    fleet must not silently degrade to single-host training (each process
    would train on its own shard with no gradient reduction).
    """
    try:
        jax.distributed.initialize()
    except Exception:
        if _looks_multiprocess():
            raise
        # single-process environment: nothing to initialize
