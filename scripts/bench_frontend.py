"""Front-end quality benchmark: Informed RRT* vs plain RRT (VERDICT r2 #7).

50 start/goal scenarios across 5 cluttered synthetic maps
(datagen.random_obstacle_map — the 70% majority of the training map mix:
walls with openings, boxes, mixed-radius pillars; open pillar-only maps
barely differentiate front-ends because greedy shortcut already straightens
plain-RRT paths there).  For each front-end: mean simplified path length, per-plan wall
time, and the corridor long_corridor rejection rate when the route feeds
the corridor pipeline (reference budget anchor: OMPL InformedRRTstar with
0.01 s, sfc_gen.hpp:45-114 / learning_planner.hpp:257).

Host-only (native C++ grid); no TPU needed for the path-length comparison —
the corridor stage runs on whatever backend JAX picks.

Writes runs/frontend/results.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from allocnet_tpu.config import AllocNetConfig, QPConfig
from allocnet_tpu.planner import planner as planner_lib
from allocnet_tpu.planner import sfc
from allocnet_tpu.train import datagen

OUT = "runs/frontend"


def path_len(route):
    return float(np.linalg.norm(np.diff(route, axis=0), axis=1).sum())


def main():
    os.makedirs(OUT, exist_ok=True)
    cfg = AllocNetConfig(qp=QPConfig(res=10))
    n_maps, per_map = 5, 10
    rows = {"rrt": [], "rrt_star": []}
    rejects = {"rrt": 0, "rrt_star": 0}
    n_ok = {"rrt": 0, "rrt_star": 0}
    walls = {"rrt": [], "rrt_star": []}

    k = 0
    for m in range(n_maps):
        pts = datagen.random_obstacle_map(seed=200 + m)
        pmap = planner_lib.build_map(pts, [0, 0, 0], [20, 20, 4], scale=0.25,
                                     dilate_r=2)
        assert pmap.native is not None, "native runtime required"
        rng = np.random.default_rng(m)
        done = 0
        while done < per_map:
            start = rng.uniform([1, 1, 0.8], [19, 19, 3.2])
            goal = rng.uniform([1, 1, 0.8], [19, 19, 3.2])
            if (np.linalg.norm(goal - start) < 10.0
                    or pmap.native.blocked(start) or pmap.native.blocked(goal)):
                continue
            lens = {}
            for name, use_star in (("rrt", False), ("rrt_star", True)):
                # RRT* is time-budget-bounded; give it iteration headroom so
                # the 50 ms budget (not the plain-RRT iteration cap) limits it
                ccfg = dataclasses.replace(
                    cfg.corridor, use_rrt_star=use_star,
                                        rrt_max_iter=(40000 if use_star
                                  else cfg.corridor.rrt_max_iter))
                t0 = time.perf_counter()
                route = planner_lib.search_route(pmap, start, goal, ccfg,
                                                 seed=k)
                walls[name].append(time.perf_counter() - t0)
                if route is None:
                    continue
                n_ok[name] += 1
                lens[name] = path_len(route)
                polys = sfc.convex_cover(route, pmap.surf, pmap.lo, pmap.hi,
                                         ccfg)
                polys = sfc.short_cut(polys)
                if len(polys) > cfg.qp.max_seg:
                    rejects[name] += 1
            if len(lens) == 2:     # compare on the common found set
                for name, v in lens.items():
                    rows[name].append(v)
            done += 1
            k += 1

    out = {"n_scenarios": n_maps * per_map}
    for name in ("rrt", "rrt_star"):
        out[name] = {
            "found": n_ok[name],
            "mean_path_len_m": float(np.mean(rows[name])),
            "median_path_len_m": float(np.median(rows[name])),
            "long_corridor_rejects": rejects[name],
            "wall_ms_p50": float(np.percentile(walls[name], 50) * 1e3),
            "wall_ms_p95": float(np.percentile(walls[name], 95) * 1e3),
        }
    out["path_len_reduction"] = 1.0 - (out["rrt_star"]["mean_path_len_m"]
                                       / out["rrt"]["mean_path_len_m"])
    per = 1.0 - np.asarray(rows["rrt_star"]) / np.asarray(rows["rrt"])
    out["per_scenario_reduction"] = {
        "p50": float(np.percentile(per, 50)),
        "p90": float(np.percentile(per, 90)),
        "max": float(per.max()),
        "frac_improved_over_1pct": float((per > 0.01).mean()),
    }
    with open(os.path.join(OUT, "results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
