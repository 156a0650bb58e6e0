"""Statistical 10 Hz drive eval at the REFERENCE DEPLOY OPERATING POINT.

VERDICT r3 next-step #1: the round-3 flight demo flew two missions on one
pillar map at a softened operating point (res=10, v<=8, a<=12).  This eval
flies the receding-horizon driver at the reference's deployed setting —
res=20 constraint samples per segment, max_vel=4 m/s, max_acc=6 m/s^2
(/root/reference/config/planner.yaml:17-23, = this repo's QPConfig
defaults) — across many missions on many varied maps, and reports the
arrival / tick-solve / latency DISTRIBUTION, not an existence proof.

Per mission: sample a far-apart (start, goal) pair on a random clutter map
(datagen.random_obstacle_map: pillars, boxes, walls with openings), build
the corridor (RRT + FIRI + shortcut), then fly the clocked driver
(cold tick = net inference + hedged QP batch; warm ticks = feasible-by-
construction warm-started re-solves at 10 Hz) until arrival or the cap.

Writes runs/drive/drive_eval.json:
  arrival_rate        fraction of missions that reach the goal (done flag
                      AND final distance < 0.3 m)
  tick_solve_rate     fraction of pre-arrival ticks whose QP re-solve
                      converged (tracking fallback ticks are the rest)
  wall_p50/p99_ms     per-tick wall latency through the device link
Targets (VERDICT): arrival >= 0.95, solve >= 0.99, p99 < 100 ms.

Usage: python scripts/drive_eval.py [n_maps missions_per_map max_ticks]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("DRIVE_EVAL_CPU"):      # solver-behavior runs off-chip
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.models import import_torch
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.planner import driver as driver_lib
from allocnet_tpu.planner import planner as planner_lib
from allocnet_tpu.train import datagen

OUT = "/root/repo/runs/drive"
EXTENT = (20.0, 20.0, 4.0)
ARRIVE_DIST = 0.3


def sample_missions(pmap, cfg, rng, want, lo, hi):
    """Sample `want` corridor-feasible (start, goal, plan) missions."""
    out = []
    attempts = 0
    while len(out) < want and attempts < 40 * want:
        attempts += 1
        start = rng.uniform(lo + 0.8, hi - 0.8)
        goal = rng.uniform(lo + 0.8, hi - 0.8)
        if np.linalg.norm(goal - start) < 0.4 * np.linalg.norm(hi - lo):
            continue
        cp = planner_lib.plan_corridor(pmap, start, goal, cfg,
                                       seed=int(rng.integers(1 << 30)))
        if cp.ok and cp.seg >= 1:
            out.append((start, cp))
    return out


def main():
    n_maps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    per_map = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    max_ticks = int(sys.argv[3]) if len(sys.argv) > 3 else 600

    os.makedirs(OUT, exist_ok=True)
    cfg = AllocNetConfig()      # THE deploy point: res=20, v<=4, a<=6
    lo, hi = np.zeros(3), np.asarray(EXTENT)

    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    # torch-free params + AOT tick executables: the deployment fast start
    # (populate once with scripts/measure_prewarm.py)
    params = import_torch.load_params(
        "/root/repo/data/params/seq5_tokenthresh0_35_cpu.msgpack")

    certify = bool(os.environ.get("DRIVE_EVAL_CERTIFY"))
    t0 = time.perf_counter()
    # AOT executables cover the tick programs; the persistent compilation
    # cache covers everything compiled in-process (corridor kernel buckets:
    # ~40 s each to compile, ~1 s to reload)
    drv = driver_lib.Driver(net, params, cfg, rate_hz=10.0, certify=certify,
                            aot_path="/root/repo/runs/drive/aot_ticks",
                            cache_dir="/root/repo/runs/drive/xla_cache")
    drv.prewarm()
    prewarm_s = time.perf_counter() - t0

    # prewarm the fused-corridor kernel buckets OUTSIDE the measured loop:
    # each (window-bucket, point-bucket) combo is a one-time XLA compile
    # that would otherwise land mid-eval (and a tunnel compile RPC is the
    # one call that can stall for minutes)
    from allocnet_tpu.planner import sfc as sfc_lib
    t0 = time.perf_counter()
    rngp = np.random.default_rng(0)
    for Bp in (4, 8, 16):
        for n_live in (300, 1900):       # -> point buckets 512 and 2048
            # a route with exactly Bp windows (walk_route at progress 3.0)
            route = np.linspace([1, 1, 1], [1 + 2.9 * Bp, 1, 1], Bp + 1)
            pts_dummy = rngp.uniform([0, 0, 0], [1 + 3.0 * Bp, 2, 4],
                                     size=(n_live, 3))
            sfc_lib.corridor_online(route, pts_dummy, lo, hi, cfg.corridor,
                                    cfg.qp)
    print(f"corridor kernel prewarm {time.perf_counter() - t0:.1f} s",
          flush=True)

    missions = []
    lats_all = []
    partial_path = os.path.join(OUT, "drive_eval_partial.jsonl")
    open(partial_path, "w").close()
    rng = np.random.default_rng(12345)
    for mi in range(n_maps):
        map_seed = 100 + mi
        pts = datagen.random_obstacle_map(map_seed, EXTENT)
        pmap = planner_lib.build_map(pts, lo, hi, scale=0.25, dilate_r=2)
        plans = sample_missions(pmap, cfg, rng, per_map, lo, hi)
        for start, cp in plans:
            st = drv.reset(start, cp.route[-1], cp.hpolys, cp.seg)
            st, res = drv.run(st, max_ticks, stop_when_done=True,
                              stall_limit=5)
            # cold-plan stall: the QP rejects this corridor's geometry at
            # every hedge (deterministic, so waiting can never help).  The
            # operator action is to RE-PLAN THE ROUTE: a fresh front-end
            # seed gives different corridor geometry and a different QP.
            flown, attempts = 0, 0
            while (not st.done and len(res) < max_ticks and flown < 4
                   and attempts < 20
                   and not np.any([r.solved for r in res[-3:]])):
                attempts += 1
                # mid-flight replans use the ONLINE front-end budget
                # (1k Informed-RRT* iterations ~ the reference's 0.01 s
                # OMPL budget); after 3 failed attempts ESCALATE to the
                # offline 5k budget — r5 root cause of the one mission
                # loss: a start position where the 1k budget mostly
                # returns no_path, so the loop burned its attempts
                # without ever getting a fresh corridor (the reference
                # would simply block on OMPL longer)
                import dataclasses as _dc
                ccfg2 = (cfg.corridor.online() if attempts <= 3
                         else cfg.corridor)
                cp2 = planner_lib.plan_corridor(
                    pmap, st.pos, cp.route[-1],
                    _dc.replace(cfg, corridor=ccfg2),
                    seed=int(rng.integers(1 << 30)))
                if not cp2.ok:
                    continue
                flown += 1
                st = drv.set_goal(st, cp2.route[-1], cp2.hpolys, cp2.seg)
                st, res2 = drv.run(st, max_ticks - len(res),
                                   stop_when_done=True, stall_limit=5)
                res = list(res) + list(res2)
            dist = float(np.linalg.norm(st.pos - st.goal))
            solved = np.array([r.solved for r in res])
            tracking = np.array([r.tracking for r in res])
            certs = [r.certified for r in res if r.certified is not None]
            # planless = failed cold tick (no plan exists, vehicle holds);
            # flight ticks = everything else (a plan was being flown)
            planless = ~solved & ~tracking
            lats = [r.latency_s for r in res]
            lats_all += lats
            missions.append({
                "map_seed": map_seed,
                "start": [round(float(v), 3) for v in start],
                "goal": [round(float(v), 3) for v in cp.route[-1]],
                "seg": int(cp.seg),
                "n_ticks": len(res),
                "arrived": bool(st.done) and dist < ARRIVE_DIST,
                "final_dist_m": round(dist, 4),
                "solve_rate": round(float(solved.mean()), 4),
                "tracking_rate": round(float(tracking.mean()), 4),
                "n_flight_ticks": int((~planless).sum()),
                "n_flight_solved": int(solved.sum()),
                "corridor_replans": flown,
                # f64 Bernstein certificate over the ACCEPTED (flown) plans
                "certified_plans": (round(float(np.mean(certs)), 4)
                                    if certs else None),
                "n_certified_plans": len(certs),
                "n_certified_true": int(sum(certs)),
            })
            m = missions[-1]
            with open(partial_path, "a") as pf:
                pf.write(json.dumps(m) + "\n")
            print(f"map {map_seed} mission {len(missions)}: "
                  f"arrived={m['arrived']} dist={m['final_dist_m']} "
                  f"ticks={m['n_ticks']} solve={m['solve_rate']}",
                  flush=True)

    lats = np.asarray(lats_all)
    arr = np.array([m["arrived"] for m in missions])
    n_ticks = np.array([m["n_ticks"] for m in missions])
    solve_ticks = np.array([m["solve_rate"] * m["n_ticks"] for m in missions])
    n_flight = np.array([m["n_flight_ticks"] for m in missions])
    n_fsolved = np.array([m["n_flight_solved"] for m in missions])
    out = {
        "operating_point": {"res": cfg.qp.res, "max_vel": cfg.qp.max_vel,
                            "max_acc": cfg.qp.max_acc,
                            "order": cfg.qp.order},
        "aot_fast_start": drv.aot_loaded,
        "solve_box_margin": 0.005,
        "n_maps": n_maps,
        "n_missions": len(missions),
        "arrival_rate": round(float(arr.mean()), 4),
        "tick_solve_rate": round(float(solve_ticks.sum() / n_ticks.sum()), 4),
        # over ticks where a plan was being flown (excludes the bounded
        # planless stalls that precede a corridor re-plan; those are the
        # net/geometry's plan rejections, surfaced via corridor_replans)
        "flight_tick_solve_rate": round(
            float(n_fsolved.sum() / max(n_flight.sum(), 1)), 4),
        "total_corridor_replans": int(sum(m["corridor_replans"]
                                          for m in missions)),
        # aggregate from RAW certified counts (ADVICE r4: reconstructing
        # from the rounded per-mission means introduced aggregation error)
        "flown_plan_certified_rate": (round(
            sum(m["n_certified_true"] for m in missions)
            / max(sum(m["n_certified_plans"] for m in missions), 1), 4)
            if certify else None),
        "wall_p50_ms": round(float(np.percentile(lats, 50) * 1e3), 2),
        "wall_p99_ms": round(float(np.percentile(lats, 99) * 1e3), 2),
        "prewarm_compile_s": round(prewarm_s, 2),
        "tick_budget_ms": 100.0,
        "final_dist_p50_m": round(float(np.percentile(
            [m["final_dist_m"] for m in missions], 50)), 4),
        "missions": missions,
    }
    name = "drive_eval_certified.json" if certify else "drive_eval.json"
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "missions"}))


if __name__ == "__main__":
    main()
