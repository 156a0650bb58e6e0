"""Receding-horizon replanning driver (the 10 Hz loop).

The reference replans on every goal/map change inside its ROS node with a
fresh OSQP cold start (learning_planning.cpp:143-188).  Here the low-latency
path is a separate compiled entry point (SURVEY §7 hard-part 5: latency vs
throughput split) that

  * reuses the previous trajectory as a WARM START: the old physical
    coefficients are re-scaled into the new problem's variables
    (qp.scale_coeffs), which lets the warm solve run ~1/3 of the cold
    iteration budget at the same polish accuracy;
  * keeps batch B = number of concurrently-replanning streams (1 for a
    single vehicle), all in one jit program.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig, SolverConfig
from allocnet_tpu.models import packing
from allocnet_tpu.ops import admm, qp


class ReplanState(NamedTuple):
    coeffs: jax.Array     # (B, S, 3, D) previous physical coefficients
    have_prev: jax.Array  # (B,) bool


def warm_solver_config(scfg: SolverConfig) -> SolverConfig:
    """Reduced iteration budget for warm-started solves.

    Half the cold per-chunk budget in one chunk, with a second polish round:
    measured on the 10 Hz driver the tick is RTT-dominated (~1.2 ms on-chip
    vs a 100 ms budget), so the extra polish round is free latency-wise and
    lifts the warm-tick solve rate."""
    return dataclasses.replace(
        scfg, n_chunks=1,
        # r5: 150 (not 75) — replaying the drive-eval warm-miss corpus,
        # 3/19 residual misses were pure budget (solve clean at 150); the
        # B=1 tick is RTT-dominated so the extra iterations are free
        iters_per_chunk=max(150, scfg.iters_per_chunk),
        polish_rounds=max(4, scfg.polish_rounds),
        # warm ticks hit the degenerate-corridor geometry the drop/enter
        # passes exist for, and the tick is RTT-dominated -- the extra KKT
        # factorization is free latency-wise (see SolverConfig)
        polish_drop_passes=max(1, scfg.polish_drop_passes),
        # final-approach re-solves (seg=1, ~0.1 s remaining) legitimately
        # exceed the reference's plan-time sanity ceiling (obj ~ T^-(2o-1));
        # residual gates still reject divergence (see SolverConfig.obj_max)
        obj_max=float("inf"))


def rescue_solver_config(scfg: SolverConfig) -> SolverConfig:
    """LIGHT certification-polish budget for warm-started in-tick rescues.

    Replaying the r5 warm-miss corpus: the 4x250 cold budget solves 6/19
    residual misses while 2x150 solves 10/19 — on a warm-started problem
    every extra chunk boundary re-scales rho from residual balance, which
    can kick the iterate off the warm fixed point it started at.  Fewer,
    longer-polished chunks win, and the rescue's on-chip cost drops ~3x
    (it sits directly in the tick's p99).  The heavy 4x250 budget remains
    the SECOND rescue stage (driver._combined_tick) for scratch-start
    recoveries that genuinely need the chunk schedule."""
    return dataclasses.replace(
        cold_solver_config(scfg), n_chunks=2, iters_per_chunk=150)


def cold_solver_config(scfg: SolverConfig) -> SolverConfig:
    """Certification-scale budget for COLD plans (fresh goal, no warm
    start).  Measured on real res=20 clutter-map corridors: the deploy
    budget (3x150 iterations) dual-stalls at ~1e-1 on a substantial
    fraction of fresh problems while 4x250 converges them cleanly
    (scripts/debug_deploy_ticks.py post-mortems).  Cold plans run once
    per goal — the reference pays a full OSQP cold solve there too
    (learning_planning.cpp:143-188).

    ns_rho_update stays OFF here: on the hardest fresh corridors the
    Newton-Schulz chunk-boundary inverse dual-stalls at ~4e-2 where the
    exact re-factorization converges at the same budget (measured, seg=2
    16 m corridor at res=20); a per-chunk Cholesky at cold-tick batch
    sizes (a few scenarios) costs nothing.

    The polish schedule matches CERTIFY_SOLVER: the drop/enter active-set
    iteration is what actually closes the hardest corridors (it reaches
    the exact active set in ~5 rounds even from a coarse ADMM iterate),
    and per-round cost at cold-tick batch sizes is one tiny KKT factor."""
    return dataclasses.replace(
        scfg, n_chunks=4, iters_per_chunk=250, ns_rho_update=False,
        polish_rounds=max(6, scfg.polish_rounds),
        polish_drop_passes=max(1, scfg.polish_drop_passes))


def init_state(batch: int, cfg: AllocNetConfig) -> ReplanState:
    S, D = cfg.qp.max_seg, cfg.qp.D
    return ReplanState(
        coeffs=jnp.zeros((batch, S, 3, D), jnp.float32),
        have_prev=jnp.zeros((batch,), bool))


def replan_step(net, params, cfg: AllocNetConfig,
                state: jax.Array, hpolys: jax.Array, seg: jax.Array,
                prev: ReplanState, time_scale: float = 1.0,
                warm: bool = True, refine_steps: int = 0):
    """One replanning tick: net inference + warm-started QP.

    warm=False runs the FULL solver budget with no warm start -- the cold
    plan() semantics of the reference on a fresh goal
    (learning_planning.cpp:143-188); warm=True is the incremental 10 Hz
    budget seeded from the previous trajectory.

    time_scale relaxes the predicted times uniformly -- the deployment
    equivalent of the reference's time-factor slack on top of the per-segment
    lower bound (min_traj_opt.py:113-133): a net whose times are aggressive
    for the current dynamics limits makes the QP borderline-infeasible, and a
    small uniform stretch restores the margin without replanning geometry.

    refine_steps > 0 additionally refines the predicted allocation through
    the differentiable QP (planner/refine.py, fixed-total mode) at the warm
    iteration budget before the final solve — each step costs ~2 reduced-
    budget solves, so 2-4 steps fit a 100 ms tick at B=1 on-chip.

    Returns (times, coeffs, solved, new ReplanState). Jit this once and call
    it at the control loop rate."""
    out = net.apply(params, packing.pack_state(state),
                    packing.pack_hpolys(hpolys))
    times, _ = out if isinstance(out, tuple) else (out, None)
    times = times * time_scale
    S = cfg.qp.max_seg
    seg_mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(times.dtype)
    times_q = jnp.where(seg_mask > 0, jnp.maximum(times, 0.05), 1.0)

    if refine_steps > 0:
        from allocnet_tpu.planner import refine as refine_lib
        ref_scfg = warm_solver_config(cfg.solver) if warm else cfg.solver
        ref = refine_lib.refine_times(cfg.qp, ref_scfg, state, hpolys,
                                      times_q, seg, steps=refine_steps)
        times_q = ref.times + (1.0 - seg_mask)
        times = jnp.where(seg_mask > 0, times_q, times)

    data = qp.build_qp(cfg.qp, state, hpolys, times_q, seg)
    x0 = qp.scale_coeffs(data, prev.coeffs)
    x0 = x0 * prev.have_prev.astype(x0.dtype).reshape(-1, 1, 1, 1)

    scfg = warm_solver_config(cfg.solver) if warm else cfg.solver
    sol = admm.solve_qp(data, scfg, x0=x0 if warm else None)

    new_prev = ReplanState(
        coeffs=jnp.where(sol.solved.reshape(-1, 1, 1, 1), sol.coeffs,
                         prev.coeffs),
        have_prev=prev.have_prev | sol.solved)
    return times * seg_mask, sol.coeffs, sol.solved, new_prev
