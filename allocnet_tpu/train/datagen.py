"""Scenario/dataset generation: maps -> corridors -> HDF5.

The counterpart of the reference's offline pipeline (pcd_segmentation.py +
corridor_generator.py + rrt3D.py -> dataset.h5; the writer itself is absent
from the reference repo, SURVEY.md section 3.3).  Works on any point-cloud
map source: real clouds (e.g. M3ED crops) via `points`, or the built-in
random-pillar maps for self-contained generation.

Reference segment times (the supervised targets `traj_times`) use the
feasibility-aware quintic bound over the corridor's inner waypoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.ops import lp
from allocnet_tpu.planner import planner as planner_lib
from allocnet_tpu.train import dataset as ds_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch, quintic_time_bounds

_FIND_INTERIOR_JIT = None


def _find_interior(hp, mask):
    global _FIND_INTERIOR_JIT
    if _FIND_INTERIOR_JIT is None:
        import jax
        _FIND_INTERIOR_JIT = jax.jit(lp.find_interior,
                                     static_argnames=("iters",))
    return _FIND_INTERIOR_JIT(hp, mask)


def random_pillar_map(seed: int, extent=(20.0, 20.0, 4.0), n_pillars=8,
                      radius=0.3) -> np.ndarray:
    """Synthetic obstacle cloud (stand-in for M3ED crops)."""
    rng = np.random.default_rng(seed)
    pts = []
    ex = np.asarray(extent)
    for _ in range(n_pillars):
        c = rng.uniform([2, 2, 0], [ex[0] - 2, ex[1] - 2, 0], size=3)
        for zz in np.linspace(0, ex[2], 24):
            ang = np.linspace(0, 2 * np.pi, 10, endpoint=False)
            pts.append(np.stack([c[0] + radius * np.cos(ang),
                                 c[1] + radius * np.sin(ang),
                                 np.full(10, zz)], axis=1))
    return np.concatenate(pts)


def random_obstacle_map(seed: int, extent=(20.0, 20.0, 4.0)) -> np.ndarray:
    """Varied synthetic clutter: pillars of random radius, axis-aligned box
    walls, and floating slabs.  Broader corridor-shape distribution than
    random_pillar_map (narrow gaps, overhangs, wall openings) for training
    data diversity; density randomized per seed."""
    rng = np.random.default_rng(seed)
    ex = np.asarray(extent)
    pts = []

    for _ in range(int(rng.integers(5, 14))):
        c = rng.uniform([2, 2, 0], [ex[0] - 2, ex[1] - 2, 0], size=3)
        radius = rng.uniform(0.2, 0.7)
        for zz in np.linspace(0, ex[2], 24):
            ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
            pts.append(np.stack([c[0] + radius * np.cos(ang),
                                 c[1] + radius * np.sin(ang),
                                 np.full(12, zz)], axis=1))

    # box obstacles: dense surface sampling of random cuboids
    for _ in range(int(rng.integers(0, 4))):
        c = rng.uniform([3, 3, 0.5], [ex[0] - 3, ex[1] - 3, ex[2] - 1])
        half = rng.uniform([0.3, 0.3, 0.3], [1.2, 1.2, 1.0])
        lo_b, hi_b = c - half, c + half
        g = [np.linspace(lo_b[k], hi_b[k], max(2, int(6 * half[k]))) for k in range(3)]
        for axis in range(3):
            for side in (lo_b[axis], hi_b[axis]):
                u, v = [k for k in range(3) if k != axis]
                uu, vv = np.meshgrid(g[u], g[v])
                face = np.zeros((uu.size, 3))
                face[:, u] = uu.ravel()
                face[:, v] = vv.ravel()
                face[:, axis] = side
                pts.append(face)

    # a wall with an opening (forces up-and-over or through-the-gap routes)
    if rng.random() < 0.5:
        wx = rng.uniform(6, ex[0] - 6)
        gap_c = rng.uniform([3, 0.8], [ex[1] - 3, ex[2] - 0.8])
        gap_r = rng.uniform(1.0, 2.0)
        ys = np.linspace(0, ex[1], 60)
        zs = np.linspace(0, ex[2], 16)
        yy, zz = np.meshgrid(ys, zs)
        keep = (np.abs(yy - gap_c[0]) > gap_r) | (np.abs(zz - gap_c[1]) > gap_r * 0.6)
        wall = np.stack([np.full(keep.sum(), wx), yy[keep], zz[keep]], axis=1)
        pts.append(wall)

    return np.concatenate(pts)


def generate(
    cfg: AllocNetConfig,
    n_samples: int,
    out_path: str | None = None,
    points: np.ndarray | None = None,
    extent=(20.0, 20.0, 4.0),
    seed: int = 0,
    time_slack: float = 2.2,
) -> ScenarioBatch:
    """Sample (start, goal) pairs on a map, build corridors, derive reference
    times; returns the ScenarioBatch and optionally writes dataset.h5."""
    rng = np.random.default_rng(seed)
    lo = np.zeros(3)
    hi = np.asarray(extent)
    if points is None:
        points = random_pillar_map(seed, extent)
    pmap = planner_lib.build_map(points, lo, hi)

    S, F = cfg.qp.max_seg, cfg.qp.max_faces
    state = np.zeros((n_samples, 2, 3, 3))
    hpolys = np.zeros((n_samples, S, F, 4))
    times = np.zeros((n_samples, S))
    segs = np.zeros((n_samples,), np.int32)

    count, attempts = 0, 0
    S = cfg.qp.max_seg
    chunk = 256
    while count < n_samples and attempts < 20 * n_samples:
        # sample a chunk of candidate (start, goal) pairs; corridors for the
        # whole chunk run through the cross-plan batched pipeline
        # (plan_corridors_batch) — one FIRI call, one overlap-LP call
        want = min(chunk, 4 * (n_samples - count))
        cand_s, cand_g = [], []
        while len(cand_s) < want and attempts < 20 * n_samples:
            attempts += 1
            start = rng.uniform(lo + 0.8, hi - 0.8)
            goal = rng.uniform(lo + 0.8, hi - 0.8)
            if np.linalg.norm(goal - start) < 0.4 * np.linalg.norm(hi - lo):
                continue
            cand_s.append(start)
            cand_g.append(goal)
        if not cand_s:
            break
        plans = planner_lib.plan_corridors_batch(
            pmap, np.asarray(cand_s), np.asarray(cand_g), cfg,
            seed=int(rng.integers(1 << 30)))

        keep = [(st, cp) for st, cp in zip(cand_s, plans)
                if cp.ok and cp.seg >= 1]
        if not keep:
            continue
        # one fixed-shape batched interior-point LP over ALL junctions of
        # ALL kept plans (the reference's get_inner_pts scheme,
        # min_traj_opt.py:251-276, solved per-plan there)
        K = len(keep)
        inter = np.zeros((K, S - 1, 2 * cfg.qp.max_faces, 4))
        for ki, (_, cp) in enumerate(keep):
            for i in range(cp.seg - 1):
                inter[ki, i] = np.concatenate(
                    [cp.hpolys[i], cp.hpolys[i + 1]])
        flat = inter.reshape(K * (S - 1), 2 * cfg.qp.max_faces, 4)
        # bucket the LP batch size: an exact-shape jit here would recompile
        # for every distinct chunk yield K (the round-2 datagen stall)
        from allocnet_tpu.planner.sfc import _bucket
        Bp = _bucket(flat.shape[0])
        if Bp != flat.shape[0]:
            flat = np.concatenate(
                [flat, np.zeros((Bp - flat.shape[0],) + flat.shape[1:])])
        mask = np.linalg.norm(flat[:, :, :3], axis=2) > 1e-6
        pts, _ = _find_interior(jnp.asarray(flat), jnp.asarray(mask, float))
        pts = np.asarray(pts)[:K * (S - 1)].reshape(K, S - 1, 3)

        for ki, (start, cp) in enumerate(keep):
            if count >= n_samples:
                break
            state[count, 0, :, 0] = start
            state[count, 1, :, 0] = cp.route[-1]
            hpolys[count] = cp.hpolys
            segs[count] = cp.seg
            waypts = [start]
            for i in range(cp.seg - 1):
                waypts.append(pts[ki, i])
            waypts.append(cp.route[-1])
            tlb = quintic_time_bounds(np.asarray(waypts),
                                      cfg.qp.max_vel, cfg.qp.max_acc)
            times[count, :cp.seg] = np.maximum(tlb, 0.3) * time_slack
            count += 1

    sc = ScenarioBatch(state=state[:count], hpolys=hpolys[:count],
                       times=times[:count], seg=segs[:count])
    sc = certify(cfg, sc)
    if out_path is not None:
        ds_lib.write_h5(out_path, sc)
    return sc


_CERTIFY_JIT: dict = {}


def certify(cfg: AllocNetConfig, sc: ScenarioBatch) -> ScenarioBatch:
    """Keep only samples whose QP solves with the reference times — an
    unsolvable reference time vector is a corrupt supervision target.
    (The reference has no such check; its training just routes those
    samples to the fallback loss every epoch.)

    The solve is jitted and the batch bucketed (padding repeats sample 0)
    so per-map varying counts hit a handful of compiled programs instead
    of one each."""
    from allocnet_tpu import config as config_lib
    from allocnet_tpu.ops import admm, qp
    from allocnet_tpu.planner.sfc import _bucket

    B = sc.state.shape[0]
    if B == 0:
        return sc
    key = (cfg.qp, config_lib.CERTIFY_SOLVER)
    if key not in _CERTIFY_JIT:
        qcfg, scfg = key
        _CERTIFY_JIT[key] = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
            qp.build_qp(qcfg, st, hp, tm, sg), scfg))
    Bp = _bucket(B)
    pad = lambda a: np.concatenate(
        [a, np.repeat(a[:1], Bp - B, axis=0)]) if Bp != B else a
    sol = _CERTIFY_JIT[key](jnp.asarray(pad(sc.state), jnp.float32),
                            jnp.asarray(pad(sc.hpolys), jnp.float32),
                            jnp.asarray(pad(sc.times), jnp.float32),
                            jnp.asarray(pad(sc.seg)))
    keep = np.asarray(sol.solved)[:B]
    return ScenarioBatch(state=sc.state[keep], hpolys=sc.hpolys[keep],
                         times=sc.times[keep], seg=sc.seg[keep])
