"""Single-chip batch-occupancy curve: solves/s vs batch size (the honest
per-chip scaling datum this one-chip environment CAN measure; real multi-
host ICI efficiency needs a slice — see parallel/scaling.py).

Deploy shapes and budget identical to bench.py's timed pass.  Writes
runs/scaling/batch_curve.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.utils import scenarios

OUT = "runs/scaling"
BATCHES = (64, 256, 1024, 4096)


def main():
    os.makedirs(OUT, exist_ok=True)
    cfg, scfg = QPConfig(), SolverConfig()
    out = {"shapes": "deploy (S<=5, 50 faces, res=20)",
           "budget": f"{scfg.n_chunks}x{scfg.iters_per_chunk} + "
                     f"{scfg.polish_rounds} polish", "points": []}
    for b in BATCHES:
        sc = scenarios.random_scenarios(cfg, b, seed=123, min_seg=1)
        args = (jnp.asarray(sc.state, jnp.float32),
                jnp.asarray(sc.hpolys, jnp.float32),
                jnp.asarray(sc.times, jnp.float32), jnp.asarray(sc.seg))
        solve = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
            qp.build_qp(cfg, st, hp, tm, sg), scfg))
        sol = solve(*args)
        solved = float(np.asarray(sol.solved).mean())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sol = solve(*args)
            float(np.asarray(sol.obj).sum())  # axon-safe device sync
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        pt = {"batch": b, "solves_per_sec": b / t, "batch_ms": t * 1e3,
              "solved_frac": solved}
        out["points"].append(pt)
        print(json.dumps(pt), flush=True)
    base = out["points"][0]["solves_per_sec"] / BATCHES[0]
    for pt in out["points"]:
        pt["occupancy_vs_b64"] = (pt["solves_per_sec"] / pt["batch"]) / base
    with open(os.path.join(OUT, "batch_curve.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": True}))


if __name__ == "__main__":
    main()
