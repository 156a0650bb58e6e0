"""End-to-end inference pipeline: corridor scenario -> learned times -> QP
-> trajectory.

TPU-native equivalent of LearningPlanner::callModel (learning_planner.hpp:
140-240): one jittable function over a BATCH of scenarios (the reference
runs one scenario per call through TorchScript + OSQP).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.models import packing
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.planner import refine as refine_lib


class PlanResult(NamedTuple):
    times: jax.Array      # (B, S) predicted segment times (masked)
    tokens: jax.Array     # (B, S) stop tokens (LSTM head; ones for MLP)
    coeffs: jax.Array     # (B, S, 3, D) trajectory coefficients
    obj: jax.Array        # (B,)
    solved: jax.Array     # (B,) QP success
    ok: jax.Array         # (B,) success incl. the times>1e-10 gate


def plan_batch(
    net,
    params,
    cfg: QPConfig,
    scfg: SolverConfig,
    state: jax.Array,    # (B, 2, 3, 3)
    hpolys: jax.Array,   # (B, S, F, 4) normalized a.x <= b
    seg: jax.Array,      # (B,)
    refine_steps: int = 0,
) -> PlanResult:
    """Network inference + batched QP solve.

    The reference gates on any predicted time < 1e-10 for an active segment
    (learning_planner.hpp:181-189); we keep that check but clamp times for
    the padded solve so the whole batch still executes fixed-shape.

    ``refine_steps > 0`` additionally runs MINCO-style time refinement
    (planner/refine.py) between the network and the final solve: the net's
    total time is redistributed across segments by gradient descent through
    the differentiable QP — a capability the reference does not have (it
    deploys the predicted times verbatim, learning_planner.hpp:174-179).
    """
    stacked_state = packing.pack_state(state)
    stacked_hpolys = packing.pack_hpolys(hpolys)

    out = net.apply(params, stacked_state, stacked_hpolys)
    times, tokens = out if isinstance(out, tuple) else (out, jnp.ones_like(out))

    S = cfg.max_seg
    seg_mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(times.dtype)
    times_ok = jnp.all(jnp.where(seg_mask > 0, times > 1e-10, True), axis=1)

    if refine_steps > 0:
        # clamp to refine's t_min BEFORE the call (matching replan_step):
        # refine_times conserves the total of the clamped allocation, so an
        # active time in (1e-10, 0.05) would otherwise silently inflate the
        # mission duration being "preserved"
        times_c = jnp.where(seg_mask > 0, jnp.maximum(times, 0.05), times)
        ref = refine_lib.refine_times(cfg, scfg, state, hpolys, times_c, seg,
                                      steps=refine_steps)
        times = ref.times + (1.0 - seg_mask)  # padded slots inert, not zero

    data = qp.build_qp(cfg, state, hpolys, times, seg)
    sol = admm.solve_qp(data, scfg)

    return PlanResult(
        times=times * seg_mask,
        tokens=tokens,
        coeffs=sol.coeffs,
        obj=sol.obj,
        solved=sol.solved,
        ok=times_ok & sol.solved,
    )
