"""MINCO-style segment-time refinement through the differentiable QP.

The reference deploys the network's predicted times verbatim
(learning_planner.hpp:174-179): the QP fixes the spatial coefficients, but
the time allocation is whatever the net said.  Because our QP layer exposes
implicit KKT gradients w.r.t. the segment times (ops/qp_diff.py — the
capability the reference only uses at training time, layers.py:137-147), we
can *refine* the allocation at inference: a few steps of projected gradient
descent on the QP's optimal value as a function of the times.  This is the
same move MINCO-lineage planners make (GCOPTER optimizes times jointly with
waypoints via L-BFGS); here it is batched over scenarios and jit-compiled.

Two modes:

* ``fix_total=True`` (default): redistribute the network's TOTAL time across
  segments — times are parametrized as ``T = T_tot * softmax(theta)`` over
  the active slots (floored at ``min_frac`` of the total so no segment
  collapses), so the mission duration the network chose is preserved exactly
  while the snap cost strictly decreases.
* ``fix_total=False``: free-time descent on ``J(T) + rho * sum(T)`` with
  ``T = exp(theta)`` clamped to ``[t_min, t_max]`` — the classic
  time-regularized objective (rho > 0 required, else J(T) is monotonically
  decreasing in T and the descent just inflates the times).

The loop is a fixed-``steps`` ``lax.scan`` of accept/reject gradient steps
with per-scenario adaptive step size (halve on reject, grow on accept), so
it is fully batched, fixed-shape, and monotone: the refined allocation is
returned only where it strictly beats the objective measured at the raw
input allocation, so the result is never worse than the input (a scenario
whose QP fails at the input point still upgrades to any feasible refined
point the descent finds).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import qp_diff

_BAD = 1e30


class RefineResult(NamedTuple):
    times: jax.Array      # (B, S) refined segment times (masked)
    obj: jax.Array        # (B,) J + rho*sum(T) at the refined allocation
    obj0: jax.Array       # (B,) same objective at the input allocation
    improved: jax.Array   # (B,) bool: obj < obj0 (strict)


@partial(jax.jit, static_argnums=(0, 1),
         static_argnames=("steps", "fix_total"))
def refine_times(
    cfg: QPConfig,
    scfg: SolverConfig,
    state: jax.Array,     # (B, 2, 3, 3)
    hpolys: jax.Array,    # (B, S, F, 4) normalized a.x <= b
    times: jax.Array,     # (B, S) initial (network) segment times
    seg: jax.Array,       # (B,)
    *,
    steps: int = 8,
    lr: float = 0.5,
    rho: float = 0.0,
    fix_total: bool = True,
    min_frac: float = 0.02,
    t_min: float = 0.05,
    t_max: float = 20.0,
) -> RefineResult:
    """Refine the per-segment time allocation by descending the QP value.

    Each step costs one differentiable solve (forward ADMM+polish + one
    active-set KKT backward), so ``steps=8`` is ~16x one plain solve —
    an offline/quality knob, off by default in the pipeline.
    """
    S = cfg.max_seg
    dtype = times.dtype
    seg_mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(dtype)
    n_act = jnp.sum(seg_mask, axis=1, keepdims=True)
    t0_safe = jnp.where(seg_mask > 0, jnp.maximum(times, t_min), 1.0)
    t_tot = jnp.sum(t0_safe * seg_mask, axis=1, keepdims=True)

    def theta_to_times(theta):
        if fix_total:
            logits = jnp.where(seg_mask > 0, theta, -jnp.inf)
            p = jax.nn.softmax(logits, axis=1) * seg_mask
            # deficit-only floor: raise fractions below min_frac to min_frac
            # and take the surplus proportionally from the above-floor
            # entries.  Unlike a blanket affine pull toward uniform, this is
            # the IDENTITY whenever every active fraction already clears the
            # floor — so theta0 maps to exactly the input allocation and
            # f0/obj0 measure the true input objective.
            pf = jnp.maximum(p, min_frac) * seg_mask
            deficit = jnp.sum(pf - p, axis=1, keepdims=True)
            above = jnp.maximum(p - min_frac, 0.0) * seg_mask
            denom = jnp.maximum(jnp.sum(above, axis=1, keepdims=True), 1e-12)
            p = pf - deficit * above / denom
            return t_tot * p
        t = jnp.exp(theta)
        return jnp.clip(t, t_min, t_max) * seg_mask + (1.0 - seg_mask)

    def phi(theta):
        t = theta_to_times(theta)
        coeffs, sol = qp_diff.solve(cfg, scfg, state, hpolys, t, seg)
        J = qp_diff.objective(cfg, state, hpolys, t, seg, coeffs)
        val = J + rho * jnp.sum(t * seg_mask, axis=1)
        val = jnp.where(sol.solved, val, _BAD)
        val = jnp.where(jnp.isfinite(val), val, _BAD)
        return jnp.sum(val), val

    theta0 = jnp.log(t0_safe)
    (_, f0), g0 = jax.value_and_grad(phi, has_aux=True)(theta0)
    g0 = g0 * seg_mask

    # baseline objective at the RAW (t_min-clamped) input allocation — one
    # extra forward solve.  theta0 maps to the same point whenever every
    # input fraction clears min_frac, but when the deficit floor engages the
    # floored start can be strictly worse than the input; measuring the
    # baseline here makes the "never worse than the input" guarantee real.
    t_raw = t0_safe * seg_mask + (1.0 - seg_mask)
    coeffs_raw, sol_raw = qp_diff.solve(cfg, scfg, state, hpolys, t_raw, seg)
    J_raw = qp_diff.objective(cfg, state, hpolys, t_raw, seg, coeffs_raw)
    f_raw = J_raw + rho * jnp.sum(t_raw * seg_mask, axis=1)
    f_raw = jnp.where(sol_raw.solved & jnp.isfinite(f_raw), f_raw, _BAD)

    def step(carry, _):
        theta_b, f_b, g_b, step_sz = carry
        cand = theta_b - step_sz[:, None] * g_b
        (_, f_c), g_c = jax.value_and_grad(phi, has_aux=True)(cand)
        g_c = g_c * seg_mask
        acc = f_c < f_b
        accf = acc.astype(dtype)[:, None]
        theta_n = accf * cand + (1.0 - accf) * theta_b
        g_n = accf * g_c + (1.0 - accf) * g_b
        f_n = jnp.where(acc, f_c, f_b)
        step_n = jnp.where(acc, step_sz * 1.3, step_sz * 0.5)
        return (theta_n, f_n, g_n, step_n), None

    init = (theta0, f0, g0, jnp.full((times.shape[0],), lr, dtype))
    (theta_b, f_b, _, _), _ = jax.lax.scan(step, init, None, length=steps)

    # accept the refined allocation only where it strictly beats the RAW
    # input objective; otherwise pass the input through untouched (this also
    # covers scenarios unsolved at the input point, where f_raw = _BAD but a
    # feasible refined point still counts as an improvement).
    improved = f_b < f_raw
    t_ref = jnp.where(improved[:, None], theta_to_times(theta_b) * seg_mask,
                      times * seg_mask)
    obj = jnp.where(improved, f_b, f_raw)
    return RefineResult(times=t_ref, obj=obj, obj0=f_raw, improved=improved)
