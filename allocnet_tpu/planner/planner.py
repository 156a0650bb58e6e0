"""Full planner: map + goal -> corridor -> learned times -> QP -> trajectory.

The application layer of the framework — equivalent of LearningPlanner
(learning_planner.hpp:243-306) + the PlannerServer plan() flow
(learning_planning.cpp:143-188), headless (no ROS): maps are point clouds,
outputs are Trajectory batches + artifact dumps (viz/artifacts.py).

Host does route search and corridor bookkeeping; the TPU does voxel dilation,
all FIRI windows, all overlap LPs, the network, and the QP — batched across
as many plan requests as you hand it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.ops import voxel
from allocnet_tpu.planner import pipeline, rrt, sfc, trajectory


class PlannerMap(NamedTuple):
    grid: voxel.VoxelGrid
    surf: np.ndarray       # (N, 3) dilated-surface points (host copy)
    lo: np.ndarray
    hi: np.ndarray
    native: object         # runtime NativeGrid or None


def build_map(points: np.ndarray, lo, hi, scale: float = 0.25,
              dilate_r: int = 2, safe_dis: float = 0.5) -> PlannerMap:
    """Point cloud -> dilated voxel map + surface cloud (the map callback,
    learning_planning.cpp:115-141). Builds the C++ collision grid when the
    native runtime is available (runtime/allocnet_native.cpp)."""
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    size = tuple(int(np.ceil((hi[j] - lo[j]) / scale)) for j in range(3))
    grid = voxel.make_grid(jnp.asarray(points, jnp.float32), lo, size, scale,
                           dilate_r)
    surf = voxel.surf_points_host(grid)
    ngrid = None
    try:
        from allocnet_tpu.planner import native
        if native.available():
            ngrid = native.NativeGrid(points, lo, hi, scale=scale,
                                      safe_dis=safe_dis)
    except Exception:
        ngrid = None
    return PlannerMap(grid=grid, surf=surf, lo=lo, hi=hi, native=ngrid)


class CorridorPlan(NamedTuple):
    route: np.ndarray            # (K, 3)
    hpolys: np.ndarray           # (S, F, 4) normalized, padded
    seg: int
    ok: bool
    reason: str


def search_route(pmap: PlannerMap, start, goal, ccfg, seed: int = 0):
    """Front-end path search + greedy shortcut.  Native grid available:
    Informed RRT* (the reference's front-end, sfc_gen.hpp:45-114) when
    ccfg.use_rrt_star, else plain RRT; Python fallback is always plain RRT
    (rrt.py).  Returns (K, 3) waypoints or None."""
    if pmap.native is not None:
        if ccfg.use_rrt_star:
            route = pmap.native.rrt_star(
                start, goal, step=ccfg.rrt_step,
                max_iter=ccfg.rrt_max_iter, goal_bias=ccfg.rrt_goal_bias,
                seed=seed, time_budget_s=ccfg.rrt_star_time_budget)
        else:
            route = pmap.native.rrt(start, goal, step=ccfg.rrt_step,
                                    max_iter=ccfg.rrt_max_iter,
                                    goal_bias=ccfg.rrt_goal_bias, seed=seed)
        if route is not None:
            route = pmap.native.simplify(route)
    else:
        route = rrt.plan(start, goal, pmap.surf, pmap.lo, pmap.hi,
                         safe_dis=ccfg.safe_distance, step=ccfg.rrt_step,
                         max_iter=ccfg.rrt_max_iter,
                         goal_bias=ccfg.rrt_goal_bias, seed=seed)
        if route is not None:
            route = rrt.simplify(route, pmap.surf, ccfg.safe_distance)
    return route


def plan_corridor(pmap: PlannerMap, start: np.ndarray, goal: np.ndarray,
                  cfg: AllocNetConfig, seed: int = 0) -> CorridorPlan:
    """Route + corridor for one (start, goal); failure taxonomy mirrors the
    reference (path-not-found learning_planner.hpp:259-262, long-corridor
    :287-291)."""
    ccfg = cfg.corridor
    route = search_route(pmap, start, goal, ccfg, seed)
    empty = np.zeros((cfg.qp.max_seg, cfg.qp.max_faces, 4))
    if route is None:
        return CorridorPlan(np.zeros((0, 3)), empty, 0, False, "no_path")

    # fully fused single-dispatch corridor (FIRI + gap test + overlap LPs
    # + greedy shortcut + goal refinement in one XLA program) — identical
    # results to the generic convex_cover/short_cut pipeline
    hp, seg, polys, goal_r = sfc.corridor_online(
        route, pmap.surf, pmap.lo, pmap.hi, ccfg, cfg.qp)
    if seg > cfg.qp.max_seg:
        return CorridorPlan(route, empty, seg, False, "long_corridor")
    route = route.copy()
    route[-1] = goal_r
    return CorridorPlan(route, hp, seg, True, "ok")


def plan_cold_pipelined(pmap: PlannerMap, start: np.ndarray,
                        goal: np.ndarray, cfg: AllocNetConfig, cold_tick,
                        seed: int = 0):
    """Speculative fully-pipelined cold plan: route search (host) ->
    fused corridor kernel -> driver cold tick, with ZERO host syncs between
    the two device programs — the cold tick is dispatched on the corridor
    kernel's device outputs BEFORE the host knows whether the corridor is
    valid, and the single final fetch returns everything (on a tunneled
    chip every intermediate sync costs a full round trip; speculation
    wastes one small solve only on the rare gap/long-corridor plans).

    cold_tick: the driver's compiled cold program (Driver._cold — jit or
    AOT), signature (state9 (1,2,3,3) f32, hpolys (1,S,F,4) f32, seg (1,)
    i32) -> (solved, plan_c, times, adv).

    Returns (ok, reason, route, hp (S,F,4), seg, solved, plan_c, times,
    adv) with device leaves fetched; reference flow anchor:
    learning_planning.cpp:158-165 (path + corridor + inference + QP =
    one "total time")."""
    ccfg = cfg.corridor
    route = search_route(pmap, start, goal, ccfg, seed)
    if route is None:
        return (False, "no_path", None) + (None,) * 6

    hp_d, mk_d, seg_d, gap_d, goal_d, state9_d = sfc.corridor_online_dispatch(
        route, pmap.surf, pmap.lo, pmap.hi, ccfg, cfg.qp)
    S = cfg.qp.max_seg
    seg_c = jnp.minimum(seg_d, S).astype(jnp.int32)
    out = cold_tick(jnp.asarray(state9_d, jnp.float32),
                    jnp.asarray(hp_d, jnp.float32)[None], seg_c[None])
    solved, plan_c, times, adv = out
    hp, seg, any_gap, goal_r, solved_h, plan_h, times_h = jax.device_get(
        (hp_d, seg_d, gap_d, goal_d, solved, plan_c, times))

    if bool(any_gap) or int(seg) > S:
        # discard the speculative solve; gap plans take the generic path
        if bool(any_gap):
            hp2, seg2, polys, goal2 = sfc.corridor_online(
                route, pmap.surf, pmap.lo, pmap.hi, ccfg, cfg.qp)
            if seg2 <= S:
                route = route.copy()
                route[-1] = goal2
                st9 = np.zeros((1, 2, 3, 3), np.float32)
                st9[0, 0, :, 0] = start
                st9[0, 1, :, 0] = goal2
                out = cold_tick(jnp.asarray(st9),
                                jnp.asarray(hp2, jnp.float32)[None],
                                jnp.asarray([seg2], jnp.int32))
                solved, plan_c, times, adv = out
                solved_h, plan_h, times_h = jax.device_get(
                    (solved, plan_c, times))
                return (True, "ok", route, hp2, int(seg2),
                        bool(solved_h[0]), plan_h, times_h, adv)
        return (False, "long_corridor" if int(seg) > S else "gap",
                route) + (None,) * 6

    route = route.copy()
    route[-1] = goal_r
    return (True, "ok", route, hp, int(seg), bool(solved_h[0]),
            plan_h, times_h, adv)


def _refine_goal(route: np.ndarray, last_poly: np.ndarray) -> np.ndarray:
    """Pull the goal inside the last polytope by interpolating toward the
    previous route point (reference refine_goal, min_traj_opt.py:214-232)."""
    goal = route[-1]
    a, b = last_poly[:, :3], last_poly[:, 3]
    if np.max(a @ goal - b) <= 0.01:
        return route
    anchor = route[-2] if len(route) > 1 else goal
    for k in range(1, 20):
        lam = 1.0 - k / 20.0
        cand = (1.0 - lam) * anchor + lam * goal
        if np.max(a @ cand - b) <= 0.0:
            out = route.copy()
            out[-1] = cand
            return out
    return route


def plan_corridors_batch(
    pmap: PlannerMap,
    starts: np.ndarray,
    goals: np.ndarray,
    cfg: AllocNetConfig,
    seed: int = 0,
) -> list[CorridorPlan]:
    """Corridors for MANY (start, goal) pairs with all device work fused:
    every FIRI window of every plan in one batched call, every shortcut
    overlap LP in another (sfc.convex_cover_many / short_cut_many).

    Routes still run serially on host (RRT is microseconds with the native
    grid); this removes the per-plan device round trips that made datagen
    ~0.5 s/sample in round 1."""
    ccfg = cfg.corridor
    B = len(starts)
    routes: list = [search_route(pmap, starts[b], goals[b], ccfg, seed + b)
                    for b in range(B)]

    ok_idx = [b for b, r in enumerate(routes) if r is not None]
    covers = sfc.convex_cover_many([routes[b] for b in ok_idx], pmap.surf,
                                   pmap.lo, pmap.hi, ccfg)
    cuts = sfc.short_cut_many(covers)

    empty = np.zeros((cfg.qp.max_seg, cfg.qp.max_faces, 4))
    out: list[CorridorPlan] = [
        CorridorPlan(np.zeros((0, 3)), empty, 0, False, "no_path")
        for _ in range(B)]
    for b, polys in zip(ok_idx, cuts):
        route = routes[b]
        if len(polys) > cfg.qp.max_seg:
            out[b] = CorridorPlan(route, empty, len(polys), False,
                                  "long_corridor")
            continue
        polys = sfc.normalize_polys(polys)
        hp, seg = sfc.to_padded(polys, cfg.qp)
        route = _refine_goal(route, polys[-1])
        out[b] = CorridorPlan(route, hp, seg, True, "ok")
    return out


class PlanOutput(NamedTuple):
    result: pipeline.PlanResult
    traj: trajectory.Trajectory
    corridor_ok: np.ndarray      # (B,) bool
    reasons: list


def plan_many(
    pmap: PlannerMap,
    starts: np.ndarray,          # (B, 3) rest-to-rest start positions
    goals: np.ndarray,           # (B, 3)
    net, params, cfg: AllocNetConfig,
    seed: int = 0,
    refine_steps: int = 0,
) -> PlanOutput:
    """Batch of full plans: corridors on host+TPU, then ONE batched
    net+QP solve for every successful corridor."""
    B = len(starts)
    S, F = cfg.qp.max_seg, cfg.qp.max_faces
    hp = np.zeros((B, S, F, 4))
    segs = np.zeros((B,), np.int32)
    oks = np.zeros((B,), bool)
    reasons = []
    state = np.zeros((B, 2, 3, 3))
    plans = plan_corridors_batch(pmap, starts, goals, cfg, seed=seed)
    for b, cp in enumerate(plans):
        reasons.append(cp.reason)
        oks[b] = cp.ok
        if cp.ok:
            hp[b] = cp.hpolys
            segs[b] = cp.seg
            state[b, 0, :, 0] = starts[b]
            # goal snapped to the end of the found route (plan(),
            # learning_planner.hpp:264 finState = route.back())
            state[b, 1, :, 0] = cp.route[-1]
        else:
            segs[b] = 1
            hp[b, 0, 0] = [1.0, 0.0, 0.0, 1e3]

    res = pipeline.plan_batch(
        net, params, cfg.qp, cfg.solver,
        jnp.asarray(state, jnp.float32), jnp.asarray(hp, jnp.float32),
        jnp.asarray(segs), refine_steps=refine_steps)
    traj = trajectory.from_solution(res.coeffs, res.times, jnp.asarray(segs))
    return PlanOutput(result=res, traj=traj, corridor_ok=oks, reasons=reasons)
