"""Clocked 10 Hz receding-horizon driver demo + latency measurement (the
reference's learning_planning.cpp loop, re-cast as a framework driver).

Flies TWO missions back to back (goal change = cold replan mid-session) and
runs each until arrival or the tick cap, then reports:
  * solve rate over all ticks and tracking-fallback rate (ticks that kept
    progressing on the shifted previous plan when the re-solve missed),
  * wall-clock per tick through the (possibly tunneled) device link,
  * pure on-chip per-tick cost via a device-chained lax.scan of ticks --
    the number that matters for an embedded deployment where the control
    stack runs next to the chip,
  * final distance to each goal (the honest end-to-end outcome).

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


def fly(drv, st, max_ticks):
    st, res = drv.run(st, max_ticks, stop_when_done=True)
    return st, res


def main():
    os.makedirs(OUT, exist_ok=True)
    max_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 400

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

    drv = driver_lib.Driver(net, params, cfg, rate_hz=10.0)
    t0 = time.perf_counter()
    drv.prewarm()
    prewarm_s = time.perf_counter() - t0

    # mission 1: start -> goal1
    st = drv.reset(start, cp1.route[-1], cp1.hpolys, cp1.seg)
    st, res1 = fly(drv, st, max_ticks)
    d1 = float(np.linalg.norm(st.pos - st.goal))

    # mission 2 (goal change -> cold replan): current pos -> goal2
    cp2 = planner_lib.plan_corridor(pmap, st.pos, goal2, cfg, seed=5)
    results = list(res1)
    d2, arrived2 = None, False
    if cp2.ok:
        st = drv.set_goal(st, cp2.route[-1], cp2.hpolys, cp2.seg)
        st, res2 = fly(drv, st, max_ticks)
        results += list(res2)
        d2 = float(np.linalg.norm(st.pos - st.goal))
        arrived2 = bool(st.done)

    lats = np.array([r.latency_s for r in results])
    solved = np.array([r.solved for r in results])
    tracking = np.array([r.tracking for r in results])

    # on-chip amortized tick cost: device-chained scan, one RTT total
    state9 = np.zeros((1, 2, 3, 3), np.float32)
    state9[0, 0, :, 0] = start
    state9[0, 1, :, 0] = cp1.route[-1]
    onchip_s, onchip_frac, onchip_arrived = driver_lib.onchip_tick_cost(
        net, params, cfg, jnp.asarray(state9),
        jnp.asarray(cp1.hpolys, jnp.float32)[None], jnp.asarray([cp1.seg]),
        n_ticks=120)

    out = {
        "n_ticks": int(len(results)),
        "solved_frac": float(solved.mean()),
        "tracking_frac": float(tracking.mean()),
        "wall_p50_ms": float(np.percentile(lats, 50) * 1e3),
        "wall_p99_ms": float(np.percentile(lats, 99) * 1e3),
        "prewarm_compile_s": float(prewarm_s),
        "onchip_tick_ms": float(onchip_s * 1e3),
        "onchip_solved_frac": float(onchip_frac),
        "onchip_arrived": bool(onchip_arrived),
        "tick_budget_ms": 100.0,
        "mission1_goal_dist_m": d1,
        "mission1_arrived": bool(len(res1) and res1[-1].state.done),
        "mission2_goal_dist_m": d2,
        "mission2_arrived": arrived2,
        "final_goal_dist_m": d2 if d2 is not None else d1,
    }
    with open(os.path.join(OUT, "latency.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
