"""Clocked receding-horizon driver: the framework's real-time loop.

The reference plans once per goal click (learning_planning.cpp:143-188) and
then only SAMPLES the fixed trajectory at 1 kHz (process(), :217-304).  This
driver goes further -- the BASELINE 10 Hz replanning budget: every tick it
re-solves the corridor QP from the current vehicle state and advances along
the refreshed trajectory.

Design (round-3 rewrite): warm ticks are **feasible by construction**.
The previous tick's accepted trajectory, restricted to [dt, T], is an exact
solution of the next tick's QP -- same corridor suffix, time allocation
(t_i - dt, t_{i+1}, ..., t_n), and the re-rooted polynomial coefficients
(trajectory.taylor_shift) as the warm start.  The tick therefore

  1. re-solves the QP from the pinned current state with that warm start
     (reduced iteration budget; the solve can only improve the remainder),
  2. falls back to TRACKING the shifted previous plan when the solve does
     not converge -- progress never stalls, exactly the reference's
     plan-once-then-track semantics (learning_planning.cpp:217-304),
  3. advances the vehicle state along the accepted trajectory by the tick
     period and rolls the corridor/plan/time bookkeeping forward (segments
     whose remaining time would fall below t_min are snapped to the next
     junction, keeping every junction exactly aligned),
  4. nudges the pinned position a few mm inside the current polytope and
     clips velocity/acceleration to the box -- the constraint grid is
     re-sampled over the new segment span, so a state advanced along the
     previous plan can sit marginally outside between old sample points
     (the reference has the same sampled-constraint gap, qp_solver.hpp:
     255-296; its goal refinement plays the same role,
     min_traj_opt.py:214-232).

The allocation NETWORK runs only on cold ticks (reset / goal change), like
the reference's once-per-plan inference (learning_planner.hpp:140-240); the
nets are trained rest-to-rest, so re-querying them from a moving state mid-
flight produces allocations the QP cannot satisfy.  Cold ticks hedge the
predicted times over a small batch of uniform stretch factors in ONE solve
batch and keep the first feasible stretch -- a TPU-shaped replacement for
retry loops.  Optional MINCO-style time refinement (planner/refine.py) stays
available per tick via refine_steps.

Everything device-side is ONE jitted function per (batch, corridor) shape;
the host work per tick is bookkeeping on a handful of scalars.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import AllocNetConfig, SolverConfig
from allocnet_tpu.models import packing
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.planner import control, replan, trajectory

# cold-tick feasibility hedge: uniform stretch factors over the predicted
# times, solved as one batch; the first (smallest-stretch) feasible one wins
HEDGE_SCALES = (1.0, 1.45, 2.1)

# minimum carried segment time; below this the advance snaps to the next
# junction (matches refine.py's t_min and replan's 0.05 clamp)
T_MIN = 0.05


class PlanState(NamedTuple):
    """Previous accepted plan, aligned to the CURRENT (rolled) corridor.

    `duals` carries the previous solve's multipliers (tree over the QP's
    EQ+INEQ row groups, rolled alongside the corridor): ADMM restarted
    from the optimal x with ZERO duals measurably diverges within the
    warm budget on hard res=20 corridors (the z/y updates re-discover
    the active set from scratch), while the (x, y) pair keeps the
    iterates at the fixed point — OSQP's own warm_start carries both."""
    coeffs: jax.Array     # (B, S, 3, D) physical coefficients
    times: jax.Array      # (B, S) masked segment times (0 on padding)
    have_prev: jax.Array  # (B,) bool
    duals: dict           # {start,end,junc,corr,box} multiplier warm start


class DriverState(NamedTuple):
    """Host-side loop state for one vehicle."""
    pos: np.ndarray          # (3,) current position
    vel: np.ndarray          # (3,)
    acc: np.ndarray          # (3,)
    hpolys: np.ndarray       # (S, F, 4) normalized corridor (a.x <= b)
    seg: int                 # active polytope count
    goal: np.ndarray         # (3,)
    prev: PlanState
    done: bool = False       # mission complete (arrived at goal)


class TickResult(NamedTuple):
    times: np.ndarray
    solved: bool             # this tick's QP re-solve converged
    state: DriverState
    telemetry: control.ControlSample | None
    latency_s: float
    tracking: bool = False   # fallback tick: tracked the previous plan
    certified: bool | None = None  # f64 Bernstein box certificate of the
    #   accepted plan (Driver(certify=True) only; computed OUTSIDE the
    #   timed region — an offline audit of the flown plans, VERDICT r3 #6)


def zero_duals(batch: int, qcfg) -> dict:
    """All-zero multiplier tree (cold start)."""
    S, R, F, o = qcfg.max_seg, qcfg.res, qcfg.max_faces, qcfg.order
    z = lambda *sh: jnp.zeros((batch,) + sh, jnp.float32)
    return {'start': z(3, 3), 'end': z(3, 3), 'junc': z(S - 1, 3, o),
            'corr': z(S, R, F), 'box': z(S, R, 3, 4)}


def _sol_duals(sol) -> dict:
    """Full multiplier tree from a QPSolution (eq from nu, ineq from lam)."""
    nu = sol.nu
    B = nu.shape[0]
    # nu layout follows tree_flat over EQ_KEYS: start(3,3) end(3,3)
    # junc(S-1,3,o)
    start = nu[:, :9].reshape(B, 3, 3)
    end = nu[:, 9:18].reshape(B, 3, 3)
    junc_flat = nu[:, 18:]
    lam = sol.lam
    S = lam['corr'].shape[1]
    o = junc_flat.shape[1] // (3 * (S - 1))
    return {'start': start, 'end': end,
            'junc': junc_flat.reshape(B, S - 1, 3, o),
            'corr': lam['corr'], 'box': lam['box']}


def _roll_duals(duals: dict, src: jax.Array, seg_new: jax.Array,
                zero_first: bool = False) -> dict:
    """Shift the multiplier tree `roll` segments forward (src = gather
    indices as used for hpolys/coeffs).  start/end duals are kept as-is —
    the pinned start changes anyway and they only seed the warm start.
    zero_first additionally clears slot 0 (splice: a frozen piece has no
    live multipliers)."""
    B, S = src.shape
    seg_axis = lambda a, ix, nd: jnp.take_along_axis(
        a, ix.reshape((B, -1) + (1,) * nd), axis=1)
    mask = (jnp.arange(S)[None, :] < seg_new[:, None]).astype(
        duals['corr'].dtype)
    corr = seg_axis(duals['corr'], src, 2) * mask[:, :, None, None]
    box = seg_axis(duals['box'], src, 3) * mask[:, :, None, None, None]
    src_j = jnp.clip(src[:, :S - 1], 0, S - 2)
    mask_j = (jnp.arange(S - 1)[None, :]
              < (seg_new - 1)[:, None]).astype(mask.dtype)
    junc = seg_axis(duals['junc'], src_j, 2) * mask_j[:, :, None, None]
    if zero_first:
        corr = corr.at[:, 0].set(0.0)
        box = box.at[:, 0].set(0.0)
        junc = junc.at[:, 0].set(0.0)
    return {'start': duals['start'], 'end': duals['end'], 'junc': junc,
            'corr': corr, 'box': box}


def init_plan(batch: int, cfg: AllocNetConfig) -> PlanState:
    S, D = cfg.qp.max_seg, cfg.qp.D
    return PlanState(coeffs=jnp.zeros((batch, S, 3, D), jnp.float32),
                     times=jnp.zeros((batch, S), jnp.float32),
                     have_prev=jnp.zeros((batch,), bool),
                     duals=zero_duals(batch, cfg.qp))


# ---------------------------------------------------------------------------
# host-side geometry helpers (kept for front-end/corridor bookkeeping)
# ---------------------------------------------------------------------------

def point_in_poly(hpoly: np.ndarray, p: np.ndarray, slack: float = 1e-6):
    """All-faces test for normalized rows [a, b] meaning a.x <= b; zero rows
    (padding) are inert."""
    a, b = hpoly[:, :3], hpoly[:, 3]
    live = np.abs(a).sum(axis=1) > 1e-9
    return bool(np.all(a[live] @ p <= b[live] + slack)) if live.any() else False


def nudge_inside(hpoly: np.ndarray, p: np.ndarray, margin: float = 0.05,
                 iters: int = 4) -> np.ndarray:
    """Project p to be >= margin inside every live face of a normalized
    polytope (rows [a, b], |a| = 1, a.x <= b)."""
    a, b = hpoly[:, :3], hpoly[:, 3]
    live = np.abs(a).sum(axis=1) > 1e-9
    q = p.astype(np.float64).copy()
    for _ in range(iters):
        v = a[live] @ q - (b[live] - margin)
        if v.max() <= 0:
            break
        i = int(np.argmax(v))
        q = q - v[i] * a[live][i]
    return q


def trim_passed(hpolys: np.ndarray, seg: int, p: np.ndarray):
    """Drop corridor prefix polytopes the vehicle has left: keep from the
    LAST polytope that contains p (consecutive polys overlap, so the last
    containing one is the current segment)."""
    idx = 0
    for i in range(seg):
        if point_in_poly(hpolys[i], p):
            idx = i
    if idx == 0:
        return hpolys, seg
    out = np.zeros_like(hpolys)
    out[:seg - idx] = hpolys[idx:seg]
    return out, seg - idx


# ---------------------------------------------------------------------------
# device-side tick kernels
# ---------------------------------------------------------------------------

def _nudge_device(hpoly: jax.Array, p: jax.Array, margin: float = 5e-3,
                  iters: int = 4) -> jax.Array:
    """Batched most-violated-face projection: hpoly (B, F, 4), p (B, 3)."""
    a, b = hpoly[..., :3], hpoly[..., 3]
    live = jnp.sum(jnp.abs(a), axis=-1) > 1e-9
    F = a.shape[1]
    for _ in range(iters):
        v = jnp.where(live, jnp.einsum('bfj,bj->bf', a, p) - (b - margin),
                      -1.0)
        onehot = jax.nn.one_hot(jnp.argmax(v, axis=1), F, dtype=p.dtype)
        ai = jnp.einsum('bf,bfj->bj', onehot, a)
        step = jnp.maximum(jnp.max(v, axis=1), 0.0)
        p = p - step[:, None] * ai
    return p


class _Advance(NamedTuple):
    state9: jax.Array    # (B, 2, 3, 3) next pinned start + goal
    hpolys: jax.Array    # (B, S, F, 4) rolled corridor
    seg: jax.Array       # (B,)
    prev: PlanState      # rolled/shifted plan = next tick's warm start
    done: jax.Array      # (B,) bool: arrived (goal at rest)


def _advance(cfg: AllocNetConfig, dt: float, plan_c: jax.Array,
             times_q: jax.Array, state9: jax.Array, hpolys: jax.Array,
             seg: jax.Array, duals: dict) -> _Advance:
    """Advance the vehicle dt along (plan_c, times_q) and roll the corridor,
    times, coefficients, and multiplier warm start so the remainder starts
    at the new state."""
    qcfg = cfg.qp
    S = qcfg.max_seg
    dtype = plan_c.dtype
    B = plan_c.shape[0]
    mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(dtype)
    dtimes = times_q * mask
    traj = trajectory.Trajectory(coeffs=plan_c, times=dtimes, seg_mask=mask)
    total = jnp.sum(dtimes, axis=1)
    dtv = jnp.full((B,), dt, dtype)

    idx, u = trajectory._locate(traj, dtv)
    ti = jnp.take_along_axis(dtimes, idx[:, None], axis=1)[:, 0]
    rem = ti - u
    # a remainder below T_MIN snaps forward to the junction: the advance
    # lands exactly at the start of the next piece (<= T_MIN extra progress),
    # keeping junction alignment exact instead of carrying a sliver segment
    snap = rem < T_MIN
    idx2 = idx + snap.astype(idx.dtype)
    done = (total - dt <= T_MIN) | (idx2 >= seg)
    idx2c = jnp.clip(idx2, 0, S - 1)
    u2 = jnp.where(snap, 0.0, u)

    cum = jnp.cumsum(dtimes, axis=1)
    seg_start = cum - dtimes
    t_eval = jnp.take_along_axis(seg_start, idx2c[:, None], axis=1)[:, 0] + u2
    t_eval = jnp.where(done, total, t_eval)
    adv = trajectory.eval_state(traj, t_eval, max_deriv=2)   # (B, 3, 3)

    roll = jnp.where(done, 0, idx2c)
    src = jnp.clip(roll[:, None] + jnp.arange(S)[None, :], 0, S - 1)
    seg_new = seg - roll
    mask_new = (jnp.arange(S)[None, :] < seg_new[:, None]).astype(dtype)

    hp_new = jnp.take_along_axis(hpolys, src[:, :, None, None], axis=1)
    hp_new = hp_new * mask_new[:, :, None, None]

    t_roll = jnp.take_along_axis(dtimes, src, axis=1)
    t_first = jnp.where(snap, t_roll[:, 0], rem)
    times_new = t_roll.at[:, 0].set(t_first) * mask_new

    c_roll = jnp.take_along_axis(plan_c, src[:, :, None, None], axis=1)
    c0 = trajectory.taylor_shift(c_roll[:, 0], u2)
    coeffs_new = c_roll.at[:, 0].set(c0) * mask_new[:, :, None, None]

    # pin the next start: mm-scale corridor nudge + box clip close the
    # re-sampled-constraint gap (see module docstring)
    vmax = jnp.asarray(qcfg.max_vel * (1.0 - 1e-3), dtype)
    amax = jnp.asarray(qcfg.max_acc * (1.0 - 1e-3), dtype)
    pos = _nudge_device(hp_new[:, 0], adv[:, 0])
    vel = jnp.clip(adv[:, 1], -vmax, vmax)
    acc = jnp.clip(adv[:, 2], -amax, amax)
    zeros = jnp.zeros_like(pos)
    start = jnp.stack([pos, jnp.where(done[:, None], zeros, vel),
                       jnp.where(done[:, None], zeros, acc)], axis=-1)
    state9_new = state9.at[:, 0].set(start)

    prev = PlanState(coeffs=coeffs_new, times=times_new,
                     have_prev=jnp.ones((B,), bool),
                     duals=_roll_duals(duals, src, seg_new))
    return _Advance(state9=state9_new, hpolys=hp_new, seg=seg_new,
                    prev=prev, done=done)


# a first segment shorter than this fraction of its successor is a SLIVER:
# the tick freezes piece 1 and re-solves only the suffix (see _warm_tick).
# Below ~0.2 the T^-(2o-1) snap weight ratio makes f32 ADMM stop converging
# outright; between ~0.3 and ~0.6 the whole-corridor re-solve is still
# *degenerate* at the deploy operating point (res=20, v<=4/a<=6): as the
# vehicle crosses a polytope at speed, the shrinking first-segment time
# drives obj ~ t1^-(2o-1) toward the feasibility boundary and even the f64
# KKT oracle fails on the captured ticks (kkt ~1e-2,
# scripts/debug_deploy_ticks.py).  The suffix sub-problem stays
# well-conditioned, so route those ticks to the splice path too.
SLIVER_RATIO = 0.6


def _warm_tick(cfg: AllocNetConfig, dt: float, refine_steps: int,
               strong: bool,
               state9: jax.Array, hpolys: jax.Array, seg: jax.Array,
               prev: PlanState, sliver_ratio: float = SLIVER_RATIO,
               rescue_scfg: SolverConfig | None = None):
    """One warm tick: re-solve from the pinned state with the shifted
    previous plan as warm start, fall back to tracking it on failure, then
    advance.  Returns (solved, plan_c, times, advance).

    Sliver handling: as the vehicle crosses a polytope, the first segment's
    remaining time shrinks toward zero and its T^-(2o-1) snap weight
    explodes relative to the next segment's — ill-conditioned beyond f32.
    When t1 < SLIVER_RATIO * t2 the tick instead FREEZES piece 1 to the
    previous plan's (feasible) sub-arc and re-solves only the remaining
    corridor from the junction state, splicing the results.  The junction
    is an old constrained sample point, so the sub-problem start is
    feasible by construction; continuity at the splice is C^2 (p, v, a
    pinned), matching the guarantee the QP gives the mission start."""
    qcfg = cfg.qp
    S = qcfg.max_seg
    D = qcfg.D
    dtype = prev.coeffs.dtype
    B = state9.shape[0]
    mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(dtype)
    times_q = jnp.where(mask > 0, jnp.maximum(prev.times, T_MIN), 1.0)

    if refine_steps > 0:
        from allocnet_tpu.planner import refine as refine_lib
        scfg_w = replan.warm_solver_config(cfg.solver)
        ref = refine_lib.refine_times(qcfg, scfg_w, state9, hpolys,
                                      times_q, seg, steps=refine_steps)
        times_q = jnp.where(mask > 0, jnp.maximum(ref.times, T_MIN), 1.0)

    sliver = (seg > 1) & (times_q[:, 0] < sliver_ratio * times_q[:, 1])

    # sub-problem B: corridor/plan rolled by one, start pinned at the
    # junction state of the previous plan's piece 0
    t1 = times_q[:, 0]
    c0 = prev.coeffs[:, 0]                                     # (B, 3, D)
    rows = jnp.stack([trajectory._deriv_row(D, r, t1) for r in range(3)],
                     axis=1)                                   # (B, 3, D)
    junc = jnp.einsum('brd,bxd->bxr', rows, c0)                # (B, 3, 3)
    state9_b = state9.at[:, 0].set(junc)
    src = jnp.clip(jnp.arange(S)[None, :] + 1, 0, S - 1) * jnp.ones(
        (B, 1), jnp.int32)
    hp_b = jnp.take_along_axis(hpolys, src[:, :, None, None], axis=1)
    seg_b = seg - 1
    mask_b = (jnp.arange(S)[None, :] < seg_b[:, None]).astype(dtype)
    times_b = jnp.where(mask_b > 0, jnp.take_along_axis(times_q, src, axis=1),
                        1.0)
    coeffs_b = jnp.take_along_axis(prev.coeffs, src[:, :, None, None], axis=1)

    sel = lambda b, a: jnp.where(
        sliver.reshape((-1,) + (1,) * (a.ndim - 1)), b, a)
    state9_s = sel(state9_b, state9)
    hp_s = sel(hp_b, hpolys)
    times_s = sel(times_b, times_q)
    seg_s = jnp.where(sliver, seg_b, seg)
    warm_c = sel(coeffs_b, prev.coeffs)
    # dual warm start, rolled by one for the sliver sub-problem
    duals_b = _roll_duals(prev.duals, src, seg_b)
    y0 = jax.tree.map(lambda b, a: sel(b, a), duals_b, prev.duals)

    data = qp.build_qp(qcfg, state9_s, hp_s, times_s, seg_s)
    x0 = qp.scale_coeffs(data, warm_c)

    def _splice(sol, sol_d):
        """Map a SPLIT-problem solution back to full-corridor space: slot 0
        = frozen previous piece, slots 1.. = the sub-problem's pieces."""
        dst = jnp.clip(jnp.arange(S)[None, :] - 1, 0, S - 1) * jnp.ones(
            (B, 1), jnp.int32)
        unrolled = jnp.take_along_axis(sol.coeffs, dst[:, :, None, None],
                                       axis=1)
        unrolled = unrolled.at[:, 0].set(prev.coeffs[:, 0])
        sol_c = sel(unrolled, sol.coeffs)
        sol_d_unrolled = _roll_duals(sol_d, dst, seg, zero_first=True)
        sol_d = jax.tree.map(lambda b, a: sel(b, a), sol_d_unrolled, sol_d)
        return sol_c, sol_d

    if strong:
        # in-tick RESCUE (run by the host only when the fast warm solve
        # missed): certification-scale budget over a 4B batch in ONE solve
        # — the split problem warm-started AND from scratch, plus the FULL
        # corridor problem (sliver split disabled) warm-started AND from
        # scratch.  A carried (x, y) pair from a nearby problem can trap
        # the iteration at a stale active set that a scratch solve escapes,
        # and the split suffix sub-problem (junction start pinned at speed)
        # is sometimes HARDER than the full problem it was protecting
        # against (r5 miss-corpus replay: 6/19 residual misses solve only
        # un-split, runs/drive/warm_miss_analysis.md).  Batching all four
        # keeps the miss path at ONE extra dispatch — a serial
        # rescue-then-rescue_full ladder measured p99 135 ms vs the 100 ms
        # tick budget.  Winner: any solved, lower objective on ties.
        scfg_t = (rescue_scfg if rescue_scfg is not None
                  else replan.cold_solver_config(cfg.solver))
        data_f = qp.build_qp(qcfg, state9, hpolys, times_q, seg)
        x0f = qp.scale_coeffs(data_f, prev.coeffs)
        cat = lambda *xs: jnp.concatenate(xs, axis=0)
        data4 = jax.tree.map(cat, data, data, data_f, data_f)
        x04 = cat(x0, jnp.zeros_like(x0), x0f, jnp.zeros_like(x0f))
        y04 = jax.tree.map(
            lambda ys, yf: cat(ys, jnp.zeros_like(ys), yf,
                               jnp.zeros_like(yf)), y0, prev.duals)
        sol4 = admm.solve_qp(data4, scfg_t, x0=x04, y0=y04)
        lanes = [jax.tree.map(lambda a: a[i * B:(i + 1) * B], sol4)
                 for i in range(4)]
        # move every lane to full-corridor space first, then pick the best
        cands = []
        for i, sol_i in enumerate(lanes):
            d_i = _sol_duals(sol_i)
            if i < 2:
                c_i, d_i = _splice(sol_i, d_i)
            else:
                c_i = sol_i.coeffs
            cands.append((sol_i.solved, sol_i.obj, c_i, d_i))
        solved, obj, sol_c, sol_d = cands[0]
        for s2, o2, c2, d2 in cands[1:]:
            take = s2 & (~solved | (o2 < obj))
            w = lambda b, a: jnp.where(
                take.reshape((-1,) + (1,) * (a.ndim - 1)), b, a)
            sol_c = w(c2, sol_c)
            sol_d = jax.tree.map(w, d2, sol_d)
            obj = jnp.where(take, o2, obj)
            solved = solved | s2
    else:
        scfg_t = replan.warm_solver_config(cfg.solver)
        sol = admm.solve_qp(data, scfg_t, x0=x0, y0=y0)
        sol_c, sol_d = _splice(sol, _sol_duals(sol))
        solved = sol.solved

    use = solved.reshape(-1, 1, 1, 1)
    plan_c = jnp.where(use, sol_c, prev.coeffs)
    plan_d = jax.tree.map(
        lambda new, old: jnp.where(
            solved.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
        sol_d, prev.duals)
    adv = _advance(cfg, dt, plan_c, times_q, state9, hpolys, seg, plan_d)
    return solved, plan_c, times_q * mask, adv


def _cold_tick(net, cfg: AllocNetConfig, dt: float, time_scale: float,
               params, state9: jax.Array, hpolys: jax.Array, seg: jax.Array):
    """Cold tick (fresh goal): net inference once, then ONE batched solve
    over the feasibility hedge; first feasible stretch wins.  Returns
    (solved, plan_c, times, advance)."""
    qcfg = cfg.qp
    S = qcfg.max_seg
    out = net.apply(params, packing.pack_state(state9),
                    packing.pack_hpolys(hpolys))
    times, _ = out if isinstance(out, tuple) else (out, None)
    times = times * time_scale
    dtype = times.dtype
    B = times.shape[0]
    H = len(HEDGE_SCALES)
    mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(dtype)
    # stop-token truncation fallback: the LSTM head occasionally emits a
    # ZERO time for an active segment (its stop token fired a step early
    # vs the corridor's segment count).  The reference fails the whole
    # plan there (learning_planner.hpp:181-189, any active time < 1e-10);
    # flooring at T_MIN instead produces a 0.05 s terminal sliver whose
    # T^-(2o-1) snap weight makes the QP numerically infeasible (measured
    # obj ~1e10; 4 of 50 deploy-eval missions never launched).  Replace
    # truncated slots with the MEAN of the nonzero active predictions —
    # scale-consistent with the net's own allocation — and let the
    # feasibility hedge stretch from there.
    active = mask > 0
    truncated = active & (times <= 1e-6)
    nz = active & ~truncated
    nz_mean = (jnp.sum(jnp.where(nz, times, 0.0), axis=1)
               / jnp.maximum(jnp.sum(nz, axis=1), 1.0))
    times = jnp.where(truncated, nz_mean[:, None], times)

    scales = jnp.asarray(HEDGE_SCALES, dtype)
    times_h = (times[None] * scales[:, None, None]).reshape(H * B, S)
    mask_h = jnp.tile(mask, (H, 1))
    times_qh = jnp.where(mask_h > 0, jnp.maximum(times_h, T_MIN), 1.0)
    state_h = jnp.tile(state9, (H, 1, 1, 1))
    hp_h = jnp.tile(hpolys, (H, 1, 1, 1))
    seg_h = jnp.tile(seg, H)

    # cold plans get the CERTIFICATION-scale iteration budget: measured on
    # real res=20 clutter-map corridors the deploy budget (3x150) stalls at
    # dua ~1e-1 on a substantial fraction of fresh problems while 4x250
    # converges them; a cold tick runs once per goal so the extra chip time
    # (~2x of a tiny B=3H solve) is irrelevant against the 100 ms budget.
    data = qp.build_qp(qcfg, state_h, hp_h, times_qh, seg_h)
    sol = admm.solve_qp(data, replan.cold_solver_config(cfg.solver))

    solved_h = sol.solved.reshape(H, B)
    first = jnp.argmax(solved_h, axis=0)              # first feasible stretch
    solved = jnp.any(solved_h, axis=0)
    pick = lambda a, shape: jnp.take_along_axis(
        a.reshape((H, B) + shape),
        first.reshape((1, B) + (1,) * len(shape)), axis=0)[0]
    plan_c = pick(sol.coeffs, (S, 3, qcfg.D))
    times_q = pick(times_qh, (S,))
    sol_d = _sol_duals(sol)
    plan_d = jax.tree.map(
        lambda a: pick(a, a.shape[1:]), sol_d)

    adv = _advance(cfg, dt, plan_c, times_q, state9, hpolys, seg, plan_d)
    # an unsolved cold tick produces no plan: the advance is discarded by
    # the caller (vehicle waits for the next tick / goal, reference
    # learning_planner.hpp:181-189 semantics)
    return solved, plan_c, times_q * mask, adv


def make_warm_tick(cfg: AllocNetConfig, rate_hz: float = 10.0,
                   refine_steps: int = 0, strong: bool = False,
                   sliver_ratio: float = SLIVER_RATIO):
    return jax.jit(functools.partial(_warm_tick, cfg, 1.0 / rate_hz,
                                     refine_steps, strong,
                                     sliver_ratio=sliver_ratio))


def _combined_tick(cfg: AllocNetConfig, dt: float, refine_steps: int,
                   state9: jax.Array, hpolys: jax.Array, seg: jax.Array,
                   prev: PlanState):
    """Warm tick with the rescue LADDER fused in-program: run the fast
    warm re-solve, and only when it misses run the 4-lane certification
    rescue — one lax.cond, ONE host dispatch either way.

    The host-side ladder (dispatch warm, sync, dispatch rescue, sync) paid
    a second ~25 ms tunnel round trip on every miss tick, putting flight
    p99 at ~101 ms against the 100 ms budget; in-program the miss path
    costs only the rescue's on-chip compute.  Single-vehicle driver only
    (the cond predicate is the B=1 scalar)."""
    solved, plan_c, times, adv = _warm_tick(
        cfg, dt, refine_steps, False, state9, hpolys, seg, prev)

    def rescue(_):
        # stage 1: LIGHT warm-friendly budget (2x150 — solves more of the
        # warm-started misses than 4x250 AND costs ~3x less on-chip, see
        # replan.rescue_solver_config)
        light = replan.rescue_solver_config(cfg.solver)
        s2, p2, t2, a2 = _warm_tick(cfg, dt, refine_steps, True,
                                    state9, hpolys, seg, prev,
                                    rescue_scfg=light)

        def heavy(_):
            # stage 2: full certification chunk schedule, for the rare
            # scratch-start recovery the light budget cannot reach
            return _warm_tick(cfg, dt, refine_steps, True,
                              state9, hpolys, seg, prev)

        return jax.lax.cond(s2[0], lambda _: (s2, p2, t2, a2), heavy,
                            operand=None)

    def keep(_):
        return solved, plan_c, times, adv

    return jax.lax.cond(solved[0], keep, rescue, operand=None)


def make_combined_tick(cfg: AllocNetConfig, rate_hz: float = 10.0,
                       refine_steps: int = 0):
    return jax.jit(functools.partial(_combined_tick, cfg, 1.0 / rate_hz,
                                     refine_steps))


def make_cold_tick(net, cfg: AllocNetConfig, params, rate_hz: float = 10.0,
                   time_scale: float = 1.0):
    return jax.jit(functools.partial(_cold_tick, net, cfg, 1.0 / rate_hz,
                                     time_scale, params))


# ---------------------------------------------------------------------------
# host driver
# ---------------------------------------------------------------------------

def enable_compilation_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache (secondary fast-start path).

    Measured on the tunneled v5e chip: a true cache hit costs only
    0.4-1.2 s per tick program, but the process still pays ~8 s of Python
    TRACING to even produce the cache keys, and any drift in the traced
    constants (e.g. a different checkpoint captured in the closure) silently
    misses.  The primary deployment path is therefore Driver.save_aot /
    aot_path: pickled *compiled executables* (jax.experimental.
    serialize_executable), which skip tracing AND compilation — a cold
    process loads and runs the first tick in ~1.5 s, the analog of the
    reference's compiled TorchScript artifact (learning_planner.hpp:58-138).
    This cache remains useful as a safety net when the AOT artifact is
    absent or rejected (manifest mismatch)."""
    import os as _os
    _os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every program regardless of size/compile time: tick programs
    # are small but their compile time is exactly what we are removing
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# --- AOT tick-executable artifacts (the deployment fast-start path) --------

_AOT_NAMES = ("cold", "tick")


def _aot_manifest(cfg: AllocNetConfig, params) -> dict:
    """Compatibility fingerprint for a saved executable set.  A serialized
    executable is only valid for the same jaxlib and device kind; the config
    repr pins the traced program, and the params digest pins the CHECKPOINT
    baked into the cold executable (a stale artifact must not silently fly
    an old network)."""
    import hashlib
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(params):
        h.update(np.asarray(leaf).tobytes())
    dev = jax.devices()[0]
    return {"jax": jax.__version__, "platform": dev.platform,
            "device_kind": dev.device_kind, "cfg": repr(cfg),
            "params_sha": h.hexdigest()[:16]}


def _aot_dummy_args(cfg: AllocNetConfig):
    """Concrete B=1 arguments fixing the tick-program signatures (the Driver
    always runs a single vehicle; shapes/dtypes are static by design)."""
    S, F = cfg.qp.max_seg, cfg.qp.max_faces
    state9 = jnp.zeros((1, 2, 3, 3), jnp.float32)
    hpolys = jnp.zeros((1, S, F, 4), jnp.float32)
    seg = jnp.zeros((1,), jnp.int32)
    return state9, hpolys, seg, init_plan(1, cfg)


class Driver:
    """Single-vehicle receding-horizon driver (B=1 device batch)."""

    def __init__(self, net, params, cfg: AllocNetConfig,
                 rate_hz: float = 10.0, telemetry_hz: float = 1000.0,
                 time_scale: float = 1.0, refine_steps: int = 0,
                 cache_dir: str | None = None, certify: bool = False,
                 aot_path: str | None = None, box_margin: float = 0.005):
        """box_margin: fractional tightening of the vel/acc box limits the
        TICK SOLVES use (the mission limits stay cfg.qp.*).  The QP only
        samples the box at res points per segment; a plan that is exactly
        feasible at the samples can exceed the limit BETWEEN them (the
        sampled-constraint blind spot the reference shares, qp_solver.hpp:
        255-296).  Measured over 171 flown deploy-point plans the per-axis
        inter-sample exceedance tops out at 0.03% of max_vel — solving
        against limits tightened by 0.5% makes every flown plan carry the
        strict f64 Bernstein box certificate AT the mission limits
        (VERDICT r4 #2) with ~17x margin over the worst observed
        exceedance, at no measurable cost in tick solve rate."""
        if cache_dir:
            enable_compilation_cache(cache_dir)
        self.certify = certify
        self.net, self.params, self.cfg = net, params, cfg
        import dataclasses as _dc
        m = 1.0 - box_margin
        self.cfg_tick = _dc.replace(cfg, qp=_dc.replace(
            cfg.qp, max_vel=cfg.qp.max_vel * m, max_acc=cfg.qp.max_acc * m))
        self.rate_hz = rate_hz
        self.telemetry_hz = telemetry_hz
        self.aot_loaded = False
        if aot_path is not None and self._load_aot(aot_path):
            self.aot_loaded = True
            return
        ct = self.cfg_tick
        self._cold = make_cold_tick(net, ct, params, rate_hz, time_scale)
        # warm tick with the certification rescue fused in-program
        # (lax.cond): every tick is exactly ONE device dispatch
        self._tick = make_combined_tick(ct, rate_hz, refine_steps)

    # -- AOT executable artifacts (fast cold start) ------------------------

    def save_aot(self, path: str) -> dict:
        """Compile the three tick programs and save them as serialized
        EXECUTABLES (jax.experimental.serialize_executable) + a manifest.
        A later process constructed with aot_path=<path> skips tracing and
        compilation entirely: measured cold-process time-to-first-tick drops
        from 30-60 s (fresh XLA compile) / ~13 s (persistent-cache hit, still
        paying trace+lower) to ~1.5-4 s.  The checkpoint is baked into the
        cold executable exactly like the reference's TorchScript artifact
        (learning_planner.hpp:58-138).  Returns {name: artifact bytes}."""
        import os
        import pickle
        import json as _json
        from jax.experimental import serialize_executable as se

        os.makedirs(path, exist_ok=True)
        state9, hpolys, seg, prev = _aot_dummy_args(self.cfg_tick)
        compiled = {
            "cold": self._cold.lower(state9, hpolys, seg).compile(),
            "tick": self._tick.lower(state9, hpolys, seg, prev).compile(),
        }
        sizes = {}
        for name, ex in compiled.items():
            blob = pickle.dumps(se.serialize(ex))
            with open(os.path.join(path, f"{name}.jaxexec"), "wb") as f:
                f.write(blob)
            sizes[name] = len(blob)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            _json.dump(_aot_manifest(self.cfg_tick, self.params), f, indent=1)
        return sizes

    def _load_aot(self, path: str) -> bool:
        """Load the serialized tick executables; False (jit fallback) on any
        mismatch or deserialization failure."""
        import os
        import pickle
        import json as _json
        from jax.experimental import serialize_executable as se

        try:
            with open(os.path.join(path, "manifest.json")) as f:
                manifest = _json.load(f)
            if manifest != _aot_manifest(self.cfg_tick, self.params):
                return False

            # deserialize the three executables CONCURRENTLY: the PJRT
            # load is C++ (GIL released) and partly round-trip-bound on a
            # tunneled chip — threading turns sum(load_i) into ~max(load_i)
            # single-vehicle programs are single-device: pin execution to
            # device 0 (the loader defaults to ALL local devices, which
            # breaks under a multi-device virtual mesh)
            dev0 = [jax.devices()[0]]

            def _one(name: str):
                with open(os.path.join(path, f"{name}.jaxexec"), "rb") as f:
                    return se.deserialize_and_load(
                        *pickle.loads(f.read()), execution_devices=dev0)

            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(len(_AOT_NAMES)) as pool:
                futs = {n: pool.submit(_one, n) for n in _AOT_NAMES}
                execs = {n: f.result() for n, f in futs.items()}
        except Exception:
            return False
        self._cold, self._tick = execs["cold"], execs["tick"]
        return True

    def prewarm(self, goal_dist: float = 5.0):
        """Compile both tick programs up front (the p99 killer: without this
        the first warm tick pays a full XLA compile mid-flight)."""
        S, F = self.cfg.qp.max_seg, self.cfg.qp.max_faces
        hp = np.zeros((1, S, F, 4), np.float32)
        # a generous axis-aligned box around the segment keeps the dummy
        # problem feasible so both code paths execute fully
        box = np.array([[1, 0, 0, goal_dist + 2.0], [-1, 0, 0, 2.0],
                        [0, 1, 0, 2.0], [0, -1, 0, 2.0],
                        [0, 0, 1, 4.0], [0, 0, -1, 1.0]], np.float32)
        hp[0, :2, :6] = box
        st = np.zeros((1, 2, 3, 3), np.float32)
        st[0, 1, 0, 0] = goal_dist
        st[0, 1, 2, 0] = 1.0
        seg = jnp.asarray([2], jnp.int32)
        solved, plan_c, times, adv = self._cold(
            jnp.asarray(st), jnp.asarray(hp), seg)
        # normalize the seg dtype ON DEVICE (no host sync mid-prewarm):
        # under enable_x64 the cold program emits int64 while the
        # (AOT-frozen) warm signature is int32, like tick()
        seg2 = jnp.asarray(adv.seg, jnp.int32)
        _ = self._tick(adv.state9, adv.hpolys, seg2, adv.prev)
        jax.block_until_ready(_[0])

    def reset(self, pos, goal, hpolys, seg) -> DriverState:
        return DriverState(
            pos=np.asarray(pos, np.float64), vel=np.zeros(3),
            acc=np.zeros(3), hpolys=np.asarray(hpolys), seg=int(seg),
            goal=np.asarray(goal, np.float64),
            prev=init_plan(1, self.cfg), done=False)

    def set_goal(self, st: DriverState, goal, hpolys, seg) -> DriverState:
        """Goal change: new corridor, drop the plan (cold replan, the
        reference's targetCallBack semantics)."""
        return st._replace(goal=np.asarray(goal, np.float64),
                           hpolys=np.asarray(hpolys), seg=int(seg),
                           prev=init_plan(1, self.cfg), done=False)

    def _pack_state9(self, st: DriverState) -> np.ndarray:
        state9 = np.zeros((1, 2, 3, 3), np.float32)
        state9[0, 0, :, 0] = st.pos
        state9[0, 0, :, 1] = st.vel
        state9[0, 0, :, 2] = st.acc
        state9[0, 1, :, 0] = st.goal
        return state9

    def tick(self, st: DriverState, telemetry: bool = False) -> TickResult:
        if st.done:
            return TickResult(times=np.zeros(self.cfg.qp.max_seg),
                              solved=True, state=st, telemetry=None,
                              latency_s=0.0, tracking=False)
        state9 = self._pack_state9(st)
        have = bool(np.asarray(st.prev.have_prev)[0])
        hp_dev = jnp.asarray(st.hpolys, jnp.float32)[None]
        seg_dev = jnp.asarray([st.seg], jnp.int32)

        t0 = time.perf_counter()
        if have:
            # ONE dispatch: the fast warm re-solve with the certification
            # rescue fused behind an in-program cond (see _combined_tick)
            solved, plan_c, times, adv = self._tick(
                jnp.asarray(state9), hp_dev, seg_dev, st.prev)
            ok = bool(np.asarray(solved)[0])
        else:
            solved, plan_c, times, adv = self._cold(
                jnp.asarray(state9), hp_dev, seg_dev)
            ok = bool(np.asarray(solved)[0])
        adv_np = np.asarray(adv.state9)     # forces the device round trip
        lat = time.perf_counter() - t0

        tracking = (not ok) and have
        if ok or tracking:
            # accepted (or tracked) plan: advance state + bookkeeping
            new_st = DriverState(
                pos=adv_np[0, 0, :, 0].astype(np.float64),
                vel=adv_np[0, 0, :, 1].astype(np.float64),
                acc=adv_np[0, 0, :, 2].astype(np.float64),
                hpolys=np.asarray(adv.hpolys[0]), seg=int(adv.seg[0]),
                goal=st.goal, prev=adv.prev,
                done=bool(np.asarray(adv.done)[0]))
        else:
            # unsolved cold tick: no plan exists, hold and wait
            new_st = st

        tel = None
        if telemetry and (ok or tracking):
            traj = trajectory.from_solution(plan_c, times, seg_dev)
            tel = control.control_horizon(
                traj, self.cfg.phys, rate_hz=self.telemetry_hz,
                horizon_s=1.0 / self.rate_hz)
        cert = None
        if self.certify and ok:
            # audit the ACCEPTED plan with the f64 Bernstein certificate
            # (outside the latency timer: an offline feasibility proof of
            # what was flown, not part of the tick budget)
            cert = bool(trajectory.certify_box_host(
                np.asarray(plan_c, np.float64), np.asarray(times, np.float64),
                np.asarray(seg_dev), self.cfg.qp.max_vel,
                self.cfg.qp.max_acc)[0])
        return TickResult(times=np.asarray(times)[0], solved=ok,
                          state=new_st, telemetry=tel, latency_s=lat,
                          tracking=tracking, certified=cert)

    def run(self, st: DriverState, n_ticks: int, realtime: bool = False,
            goal_changes: dict | None = None, telemetry: bool = False,
            stop_when_done: bool = False, stall_limit: int = 10):
        """Run n_ticks; goal_changes maps tick index -> (goal, hpolys, seg).
        Returns (final state, list of TickResult).

        stall_limit: consecutive PLANLESS ticks (cold solve failed, nothing
        to track) before giving up.  A failing cold tick is deterministic —
        the state does not change, so re-running it every period can never
        recover; the caller should re-plan the corridor (fresh front-end
        seed -> different geometry) or surface the failure, exactly like
        the reference's plan() returning false to the goal callback
        (learning_planner.hpp:181-189).  0 disables."""
        results = []
        period = 1.0 / self.rate_hz
        stalled = 0
        for k in range(n_ticks):
            if goal_changes and k in goal_changes:
                st = self.set_goal(st, *goal_changes[k])
            r = self.tick(st, telemetry=telemetry)
            planless = (not r.solved) and (not r.tracking)
            stalled = stalled + 1 if planless else 0
            st = r.state
            results.append(r)
            if stop_when_done and st.done:
                break
            if stall_limit and stalled >= stall_limit:
                break
            if realtime and r.latency_s < period:
                time.sleep(period - r.latency_s)
        return st, results


def onchip_tick_cost(net, params, cfg: AllocNetConfig, state9, hpolys, seg,
                     n_ticks: int = 50, rate_hz: float = 10.0,
                     time_scale: float = 1.0, refine_steps: int = 0):
    """Pure on-chip per-tick cost: cold plan + n_ticks warm ticks chained on
    device via lax.scan, one host round trip total.  Separates solver
    latency from tunnel/dispatch RTT, which dominates single-tick wall-clock
    through a remote chip.  Returns (seconds/tick, solved fraction over
    pre-arrival ticks, arrived fraction)."""
    dt = 1.0 / rate_hz

    def body(carry, _):
        state9, hp, seg, prev, done = carry
        solved, _, _, adv = _warm_tick(cfg, dt, refine_steps, False,
                                       state9, hp, seg, prev)
        # after arrival the tick is a no-op (hold the done state)
        pickt = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((-1,) + (1,) * (a.ndim - 1)), b, a), new, old)
        new_carry = (pickt(adv.state9, state9), pickt(adv.hpolys, hp),
                     jnp.where(done, seg, adv.seg), pickt(adv.prev, prev),
                     done | adv.done)
        return new_carry, (solved | done, done)

    def run(state9, hp, seg):
        solved0, _, _, adv = _cold_tick(net, cfg, dt, time_scale, params,
                                        state9, hp, seg)
        carry = (adv.state9, adv.hpolys, adv.seg, adv.prev, adv.done)
        carry, (solved, was_done) = jax.lax.scan(
            body, carry, None, length=n_ticks - 1)
        solved = jnp.concatenate([solved0[None], solved])
        arrived = carry[4]
        return solved, arrived

    fn = jax.jit(run)
    solved, arrived = fn(state9, hpolys, seg)
    np.asarray(solved)                                # warm-up + sync
    t0 = time.perf_counter()
    solved, arrived = fn(state9, hpolys, seg)
    frac = float(np.asarray(solved).mean())           # forces full sync
    wall = time.perf_counter() - t0
    return wall / n_ticks, frac, float(np.asarray(arrived).mean())
