"""Headline benchmark: batched corridor-constrained min-snap solves/s/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.md): >= 1000 solves/s/chip at OSQP-parity accuracy.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.utils import scenarios


def main():
    cfg = QPConfig()          # deployment operating point: min-snap, res=20
    scfg = SolverConfig()
    B = 1024

    sc = scenarios.random_scenarios(cfg, B, seed=123, min_seg=1)
    args = [
        jnp.asarray(sc.state, jnp.float32),
        jnp.asarray(sc.hpolys, jnp.float32),
        jnp.asarray(sc.times, jnp.float32),
        jnp.asarray(sc.seg),
    ]

    solve = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
        qp.build_qp(cfg, st, hp, tm, sg), scfg))

    sol = solve(*args)
    float(np.asarray(sol.obj).sum())  # warm-up + sync

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        sol = solve(*args)
        float(np.asarray(sol.obj).sum())  # force full sync
    dt = (time.time() - t0) / reps

    # accuracy gate in the SAME run: the throughput number only counts if the
    # benchmarked batch actually solved (residuals within tolerance + the
    # reference's objective sanity window).  A perf change that trades
    # accuracy shows up here, not silently.
    solved_frac = float(np.asarray(sol.solved).mean())
    ok = np.asarray(sol.solved)
    # OSQP-normalized residuals (pri_res / (1 + scale)): the solver's own
    # acceptance criterion is pri_rel < eps*10 = 1e-3 — gate on that, plus an
    # absolute backstop so large-scale scenarios can't hide big violations.
    max_rel = float(np.maximum(np.asarray(sol.pri_rel), np.asarray(sol.dua_rel))[ok].max())
    max_pri = float(np.asarray(sol.pri_res)[ok].max())
    assert solved_frac >= 0.93, f"solved fraction {solved_frac:.3f} < 0.93"
    assert max_rel < 1e-3, f"max normalized residual {max_rel:.2e} on solved set"
    assert max_pri < 5e-2, f"max primal residual {max_pri:.2e} on solved set"

    value = B / dt
    print(json.dumps({
        "metric": "minsnap_qp_solves_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "solves/s",
        "vs_baseline": round(value / 1000.0, 3),
        "solved_frac": round(solved_frac, 4),
    }))


if __name__ == "__main__":
    main()
