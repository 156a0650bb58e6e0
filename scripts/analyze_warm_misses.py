"""Replay captured warm-tick failures against the driver's solve ladder.

Companion of scripts/debug_deploy_ticks.py (which flies missions on CPU and
pickles every failing tick's exact state): this post-processor batches ALL
captured WARM failures through each rung of the driver's ladder —

  warm      the fast warm-started re-solve (replan.warm_solver_config)
  rescue    certification-budget 2-lane rescue (warm start + scratch)
  full      certification-budget FULL-CORRIDOR re-solve, sliver split off

and reports per-rung and cumulative solve counts.  The r5 corpus
(4 maps x 3 missions, 1150 ticks) produced 19 true warm misses:
warm@150 solves 3, the full-corridor rung 6 more; the residual ~10 fail
even the certification budget from any start — genuinely degenerate
corridor geometry that the tracking fallback flies through benignly
(arrival and certificate rates unaffected; see runs/drive/
warm_miss_analysis.md).

Usage: python scripts/debug_deploy_ticks.py 4 3 400   # writes the corpus
       python scripts/analyze_warm_misses.py [corpus.pkl]
"""

import dataclasses
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.planner import driver as driver_lib


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/deploy_tick_failures.pkl"
    cfg = AllocNetConfig()
    m = 1.0 - 0.005            # the Driver's default box_margin
    cfg_t = dataclasses.replace(cfg, qp=dataclasses.replace(
        cfg.qp, max_vel=cfg.qp.max_vel * m, max_acc=cfg.qp.max_acc * m))

    with open(path, "rb") as f:
        failures = pickle.load(f)
    warm = [(mi, k, s) for mi, k, s in failures if s["warm"]]
    print(f"warm failures: {len(warm)} of {len(failures)} captured ticks")
    if not warm:
        return
    B = len(warm)
    state9 = jnp.asarray(np.concatenate([s["state9"] for _, _, s in warm]))
    hp = jnp.asarray(np.stack([s["hpolys"] for _, _, s in warm]), jnp.float32)
    seg = jnp.asarray([s["seg"] for _, _, s in warm], jnp.int32)
    prev = driver_lib.PlanState(
        coeffs=jnp.asarray(np.concatenate(
            [s["prev_coeffs"] for _, _, s in warm]), jnp.float32),
        times=jnp.asarray(np.concatenate(
            [s["prev_times"] for _, _, s in warm]), jnp.float32),
        have_prev=jnp.ones((B,), bool),
        duals=jax.tree.map(
            lambda *a: jnp.asarray(np.concatenate(a), jnp.float32),
            *[s["prev_duals"] for _, _, s in warm]))

    def run(tag, strong, ratio):
        fn = jax.jit(lambda *a: driver_lib._warm_tick(
            cfg_t, 0.1, 0, strong, *a, sliver_ratio=ratio))
        s = np.asarray(fn(state9, hp, seg, prev)[0])
        print(f"{tag}: solves {int(s.sum())}/{B}")
        return s

    s_w = run("warm (deployed budget)", False, driver_lib.SLIVER_RATIO)
    s_r = run("rescue (2-lane cert budget)", True, driver_lib.SLIVER_RATIO)
    s_f = run("rescue_full (sliver off)", True, 0.0)
    print("ladder union:", int((s_w | s_r | s_f).sum()), "/", B)


if __name__ == "__main__":
    main()
