"""Scaling-efficiency measurement harness.

North-star metric #2 (BASELINE.md): >= 85% data-parallel scaling efficiency
from 1 chip to N chips/hosts.  The harness measures weak scaling of the
batched QP solve (and optionally the train step) over a dp mesh:

    efficiency(N) = throughput(N devices, N*B scenarios)
                    / (N * throughput(1 device, B scenarios))

On real multi-chip hardware it runs as-is; in this environment (one chip)
it validates the code path on a virtual CPU mesh
(xla_force_host_platform_device_count) and reports those numbers clearly
labeled.  Multi-host: call parallel.mesh.initialize_distributed() first —
the same mesh code covers hosts x chips.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.parallel import mesh as mesh_lib
from allocnet_tpu.utils import scenarios


def _throughput(step: Callable, args, reps: int = 3) -> float:
    out = step(*args)
    jax.tree.map(lambda a: np.asarray(a), out)     # sync
    t0 = time.time()
    for _ in range(reps):
        out = step(*args)
        jax.tree.map(lambda a: np.asarray(a), out)
    return (time.time() - t0) / reps


def solve_scaling(
    per_device_batch: int = 256,
    device_counts: tuple[int, ...] | None = None,
    cfg: QPConfig | None = None,
    scfg: SolverConfig | None = None,
    seed: int = 0,
) -> dict:
    """Weak-scaling sweep of the batched solve over dp meshes."""
    cfg = cfg or QPConfig()
    scfg = scfg or SolverConfig()
    n_dev = len(jax.devices())
    device_counts = device_counts or tuple(
        n for n in (1, 2, 4, 8, 16) if n <= n_dev)

    results = {}
    base = None
    for nd in device_counts:
        B = per_device_batch * nd
        sc = scenarios.random_scenarios(cfg, B, seed=seed, min_seg=1)
        m = mesh_lib.make_mesh(nd)
        args = mesh_lib.shard_batch(m, (
            jnp.asarray(sc.state, jnp.float32),
            jnp.asarray(sc.hpolys, jnp.float32),
            jnp.asarray(sc.times, jnp.float32),
            jnp.asarray(sc.seg)))

        step = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
            qp.build_qp(cfg, st, hp, tm, sg), scfg).obj)
        dt = _throughput(step, args)
        tput = B / dt
        if base is None:
            base = tput
        results[nd] = {
            "batch": B,
            "solves_per_sec": tput,
            "efficiency": tput / (base * nd),
        }
    results["platform"] = jax.devices()[0].platform
    return results


def main():
    import json
    print(json.dumps(solve_scaling(), indent=2, default=float))


if __name__ == "__main__":
    main()
