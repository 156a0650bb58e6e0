"""Clocked receding-horizon driver: the framework's real-time loop.

The reference plans once per goal click (learning_planning.cpp:143-188) and
then only SAMPLES the fixed trajectory at 1 kHz (process(), :217-304).  This
driver goes further -- the BASELINE 10 Hz replanning budget: every tick it

  1. advances the vehicle state along the previously-planned trajectory by
     the tick period (simulating perfect tracking, like the reference's
     odometry-free visualization loop),
  2. trims corridor polytopes the vehicle has already passed (host-side
     point-in-polytope tests; the reference instead rebuilds the corridor on
     every goal change, learning_planner.hpp:243-306),
  3. replans from the advanced state with the warm-started low-latency QP
     entry point (replan.replan_step: net inference + 1-chunk ADMM + polish),
  4. emits 1 kHz control telemetry for the tick interval
     (control.control_horizon -> speed/thrust/tilt/body-rate).

A goal change mid-run swaps the corridor (host front-end) and the warm start
is dropped for that tick -- exactly the reference's cold-replan semantics.

Everything device-side is ONE jitted function per (batch, corridor) shape;
the host work per tick is a handful of dot products.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.planner import control, replan, trajectory


class DriverState(NamedTuple):
    """Host-side loop state for one vehicle."""
    pos: np.ndarray          # (3,) current position
    vel: np.ndarray          # (3,)
    acc: np.ndarray          # (3,)
    hpolys: np.ndarray       # (S, F, 4) normalized corridor (a.x <= b)
    seg: int                 # active polytope count
    goal: np.ndarray         # (3,)
    prev: replan.ReplanState


class TickResult(NamedTuple):
    times: np.ndarray
    solved: bool
    state: DriverState
    telemetry: control.ControlSample | None
    latency_s: float


def point_in_poly(hpoly: np.ndarray, p: np.ndarray, slack: float = 1e-6):
    """All-faces test for normalized rows [a, b] meaning a.x <= b; zero rows
    (padding) are inert."""
    a, b = hpoly[:, :3], hpoly[:, 3]
    live = np.abs(a).sum(axis=1) > 1e-9
    return bool(np.all(a[live] @ p <= b[live] + slack)) if live.any() else False


def nudge_inside(hpoly: np.ndarray, p: np.ndarray, margin: float = 0.05,
                 iters: int = 4) -> np.ndarray:
    """Project p to be >= margin inside every live face of a normalized
    polytope (rows [a, b], |a| = 1, a.x <= b).  The start-side mirror of the
    reference's goal refinement (min_traj_opt.py:214-232): a trajectory only
    satisfies corridor constraints at SAMPLE points, so the state advanced
    along it between samples can sit marginally outside -- replanning from
    there is infeasible by construction, and a cm-scale snap back inside is
    the standard tracking-error recovery."""
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


def _device_tick(net, cfg: AllocNetConfig, dt: float, params, time_scale,
                 warm, refine_steps, state9, hpolys, seg,
                 prev: replan.ReplanState):
    """state9 (B,2,3,3) -> replan -> advance along the new trajectory by dt.
    Returns (times, coeffs, solved, advanced p/v/a, new ReplanState)."""
    times, coeffs, solved, new_prev = replan.replan_step(
        net, params, cfg, state9, hpolys, seg, prev, time_scale=time_scale,
        warm=warm, refine_steps=refine_steps)
    traj = trajectory.from_solution(coeffs, times, seg)
    B = coeffs.shape[0]
    st = trajectory.eval_state(
        traj, jnp.full((B,), dt, coeffs.dtype), max_deriv=2)   # (B, 3, 3)
    # if unsolved, hold the previous state (st is garbage): caller keeps pos
    return times, coeffs, solved, st, new_prev


def make_tick(net, cfg: AllocNetConfig, params, rate_hz: float = 10.0,
              time_scale: float = 1.0, warm: bool = True,
              refine_steps: int = 0):
    """Jit-compiled device tick closure; one compilation per corridor shape."""
    return jax.jit(functools.partial(_device_tick, net, cfg, 1.0 / rate_hz,
                                     params, time_scale, warm, refine_steps))


class Driver:
    """Single-vehicle receding-horizon driver (B=1 device batch)."""

    def __init__(self, net, params, cfg: AllocNetConfig,
                 rate_hz: float = 10.0, telemetry_hz: float = 1000.0,
                 time_scale: float = 1.0, refine_steps: int = 0):
        self.net, self.params, self.cfg = net, params, cfg
        self.rate_hz = rate_hz
        self.telemetry_hz = telemetry_hz
        # cold tick = the reference's full-budget plan() on a fresh goal;
        # warm tick = the incremental low-latency budget seeded from the
        # previous trajectory.  The driver picks per tick by have_prev.
        self._tick_warm = make_tick(net, cfg, params, rate_hz, time_scale,
                                    warm=True, refine_steps=refine_steps)
        self._tick_cold = make_tick(net, cfg, params, rate_hz, time_scale,
                                    warm=False, refine_steps=refine_steps)

    def reset(self, pos, goal, hpolys, seg) -> DriverState:
        return DriverState(
            pos=np.asarray(pos, np.float64), vel=np.zeros(3),
            acc=np.zeros(3), hpolys=np.asarray(hpolys), seg=int(seg),
            goal=np.asarray(goal, np.float64),
            prev=replan.init_state(1, self.cfg))

    def set_goal(self, st: DriverState, goal, hpolys, seg) -> DriverState:
        """Goal change: new corridor, drop the warm start (cold replan, the
        reference's targetCallBack semantics)."""
        return st._replace(goal=np.asarray(goal, np.float64),
                           hpolys=np.asarray(hpolys), seg=int(seg),
                           prev=replan.init_state(1, self.cfg))

    def tick(self, st: DriverState, telemetry: bool = False) -> TickResult:
        hp, seg = trim_passed(st.hpolys, st.seg, st.pos)
        pos = nudge_inside(hp[0], st.pos)
        state9 = np.zeros((1, 2, 3, 3), np.float32)
        state9[0, 0, :, 0] = pos
        state9[0, 0, :, 1] = st.vel
        state9[0, 0, :, 2] = st.acc
        state9[0, 1, :, 0] = st.goal

        fn = (self._tick_warm if bool(np.asarray(st.prev.have_prev)[0])
              else self._tick_cold)
        t0 = time.perf_counter()
        times, coeffs, solved, adv, new_prev = fn(
            jnp.asarray(state9), jnp.asarray(hp, jnp.float32)[None],
            jnp.asarray([seg]), st.prev)
        adv_np = np.asarray(adv)          # forces the device round trip
        ok = bool(np.asarray(solved)[0])
        lat = time.perf_counter() - t0

        tel = None
        if ok:
            traj = trajectory.from_solution(coeffs, times, jnp.asarray([seg]))
            if telemetry:
                tel = control.control_horizon(
                    traj, self.cfg.phys, rate_hz=self.telemetry_hz,
                    horizon_s=1.0 / self.rate_hz)
            new_st = st._replace(
                pos=adv_np[0, 0].astype(np.float64),
                vel=adv_np[0, 1].astype(np.float64),
                acc=adv_np[0, 2].astype(np.float64),
                hpolys=hp, seg=seg, prev=new_prev)
        else:
            # failed replan: hold state, keep the old warm start and corridor
            new_st = st._replace(hpolys=hp, seg=seg)
        return TickResult(times=np.asarray(times)[0], solved=ok,
                          state=new_st, telemetry=tel, latency_s=lat)

    def run(self, st: DriverState, n_ticks: int, realtime: bool = False,
            goal_changes: dict | None = None, telemetry: bool = False):
        """Run n_ticks; goal_changes maps tick index -> (goal, hpolys, seg).
        Returns (final state, list of TickResult)."""
        results = []
        period = 1.0 / self.rate_hz
        for k in range(n_ticks):
            if goal_changes and k in goal_changes:
                st = self.set_goal(st, *goal_changes[k])
            r = self.tick(st, telemetry=telemetry)
            st = r.state
            results.append(r)
            if realtime and r.latency_s < period:
                time.sleep(period - r.latency_s)
        return st, results


def onchip_tick_cost(net, params, cfg: AllocNetConfig, state9, hpolys, seg,
                     n_ticks: int = 50, rate_hz: float = 10.0,
                     time_scale: float = 1.0, refine_steps: int = 0):
    """Pure on-chip per-tick cost: n_ticks chained on device via lax.scan
    (state advanced along each new trajectory, fixed corridor), one host
    round trip total.  Separates solver latency from tunnel/dispatch RTT,
    which dominates single-tick wall-clock through a remote chip."""
    dt = 1.0 / rate_hz

    def body(carry, _):
        state9, prev = carry
        times, coeffs, solved, adv, prev = _device_tick(
            net, cfg, dt, params, time_scale, True, refine_steps, state9,
            hpolys, seg, prev)
        okf = solved.astype(state9.dtype).reshape(-1, 1, 1)
        new0 = jnp.transpose(adv, (0, 2, 1)) * okf \
            + state9[:, 0] * (1.0 - okf)
        state9 = state9.at[:, 0].set(new0)
        return (state9, prev), solved

    def run(state9):
        (s9, _), solved = jax.lax.scan(
            body, (state9, replan.init_state(state9.shape[0], cfg)),
            None, length=n_ticks)
        return s9, solved

    fn = jax.jit(run)
    s9, solved = fn(state9)
    np.asarray(s9)                                    # warm-up + sync
    t0 = time.perf_counter()
    s9, solved = fn(state9)
    frac = float(np.asarray(solved).mean())           # forces full sync
    wall = time.perf_counter() - t0
    return wall / n_ticks, frac
