"""Clocked 10 Hz receding-horizon driver demo + latency measurement (the
reference's learning_planning.cpp loop, re-cast as a framework driver).

Runs N ticks of plan -> advance -> replan on a synthetic map with a goal
change mid-run, then reports:
  * wall-clock per tick through the (possibly tunneled) device link --
    what a host-in-the-loop deployment sees;
  * pure on-chip per-tick cost via a device-chained lax.scan of ticks --
    the number that matters for an embedded deployment where the control
    stack runs next to the chip.

Writes runs/drive/latency.json and prints a summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig, QPConfig, SolverConfig
from allocnet_tpu.models import import_torch
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.planner import driver as driver_lib
from allocnet_tpu.planner import planner as planner_lib

OUT = "/root/repo/runs/drive"


def pillar_map(n=3, seed=2):
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(n):
        c = rng.uniform([6, 6, 0], [14, 14, 0], size=3)
        for zz in np.linspace(0, 4, 20):
            ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
            pts.append(np.stack([c[0] + 0.3 * np.cos(ang),
                                 c[1] + 0.3 * np.sin(ang),
                                 np.full(8, zz)], axis=1))
    return np.concatenate(pts)


def main():
    os.makedirs(OUT, exist_ok=True)
    n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    cfg = AllocNetConfig(qp=QPConfig(res=10, max_vel=8.0, max_acc=12.0),
                         solver=SolverConfig(n_chunks=2, iters_per_chunk=150))
    pts = pillar_map()
    pmap = planner_lib.build_map(pts, [0, 0, 0], [20, 20, 4], scale=0.25,
                                 dilate_r=2)
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(jnp.asarray, import_torch.load_torchscript_lstm(
        "/root/reference/src/planner/models/seq5_tokenthresh0_35_cpu.pt"))

    start = np.array([1.0, 1.0, 1.5])
    goal1 = np.array([18.0, 2.0, 1.5])
    goal2 = np.array([18.0, 18.0, 2.0])
    cp1 = planner_lib.plan_corridor(pmap, start, goal1, cfg, seed=3)
    assert cp1.ok, cp1.reason

    drv = driver_lib.Driver(net, params, cfg, rate_hz=10.0, time_scale=2.5)
    st = drv.reset(start, cp1.route[-1], cp1.hpolys, cp1.seg)

    # warm-up compile tick (excluded from stats)
    _ = drv.tick(st)

    half = n_ticks // 2
    st, res1 = drv.run(st, half)
    cp2 = planner_lib.plan_corridor(pmap, st.pos, goal2, cfg, seed=5)
    results = list(res1)
    if cp2.ok:
        st = drv.set_goal(st, cp2.route[-1], cp2.hpolys, cp2.seg)
        _ = drv.tick(st)      # possible reshape recompile, exclude
        st, res2 = drv.run(st, n_ticks - half)
        results += list(res2)

    lats = np.array([r.latency_s for r in results])
    solved = np.array([r.solved for r in results])

    # on-chip amortized tick cost: device-chained scan, one RTT total
    state9 = np.zeros((1, 2, 3, 3), np.float32)
    state9[0, 0, :, 0] = start
    state9[0, 1, :, 0] = cp1.route[-1]
    onchip_s, frac = driver_lib.onchip_tick_cost(
        net, params, cfg, jnp.asarray(state9),
        jnp.asarray(cp1.hpolys, jnp.float32)[None], jnp.asarray([cp1.seg]),
        n_ticks=50, time_scale=2.5)

    out = {
        "n_ticks": int(len(results)),
        "solved_frac": float(solved.mean()),
        "wall_p50_ms": float(np.percentile(lats, 50) * 1e3),
        "wall_p99_ms": float(np.percentile(lats, 99) * 1e3),
        "onchip_tick_ms": float(onchip_s * 1e3),
        "onchip_solved_frac": float(frac),
        "tick_budget_ms": 100.0,
        "final_goal_dist_m": float(np.linalg.norm(st.pos - st.goal)),
    }
    with open(os.path.join(OUT, "latency.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
