"""Diagnose the driver's failing warm ticks: re-run the two drive.py
missions, capture every tick where the re-solve missed, and report the
scenario state (sliver flag, segment count, first-segment time ratio) plus
the solver residuals at the failure.  Analysis tool, not part of the
framework surface."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig, QPConfig, SolverConfig
from allocnet_tpu.models import import_torch
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.planner import driver as driver_lib
from allocnet_tpu.planner import planner as planner_lib
from allocnet_tpu.planner import replan, trajectory
from scripts.drive import pillar_map


def main():
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
    drv.prewarm()

    failures = []   # (mission, tick#, snapshot dict)

    def fly(st, mission, max_ticks=400):
        for k in range(max_ticks):
            if st.done:
                break
            snap = None
            if bool(np.asarray(st.prev.have_prev)[0]):
                snap = dict(state9=drv._pack_state9(st),
                            hpolys=st.hpolys.copy(), seg=st.seg,
                            prev_coeffs=np.asarray(st.prev.coeffs),
                            prev_times=np.asarray(st.prev.times))
            r = drv.tick(st)
            if (not r.solved) and snap is not None:
                failures.append((mission, k, snap))
            st = r.state
        return st

    st = drv.reset(start, cp1.route[-1], cp1.hpolys, cp1.seg)
    st = fly(st, 1)
    cp2 = planner_lib.plan_corridor(pmap, st.pos, goal2, cfg, seed=5)
    assert cp2.ok, cp2.reason
    st = drv.set_goal(st, cp2.route[-1], cp2.hpolys, cp2.seg)
    st = fly(st, 2)
    print(f"captured {len(failures)} failing warm ticks", flush=True)

    # post-mortem on each failure: rebuild exactly what _warm_tick solves
    scfg_w = replan.warm_solver_config(cfg.solver)
    S = cfg.qp.max_seg
    for mission, k, snap in failures:
        state9 = jnp.asarray(snap["state9"])
        hp = jnp.asarray(snap["hpolys"], jnp.float32)[None]
        seg = jnp.asarray([snap["seg"]])
        prev = driver_lib.PlanState(
            coeffs=jnp.asarray(snap["prev_coeffs"]),
            times=jnp.asarray(snap["prev_times"]),
            have_prev=jnp.ones((1,), bool),
            duals=driver_lib.zero_duals(1, cfg.qp))
        mask = (np.arange(S) < snap["seg"]).astype(np.float32)
        tq = np.where(mask > 0, np.maximum(snap["prev_times"][0], 0.05), 1.0)
        sliver = snap["seg"] > 1 and tq[0] < driver_lib.SLIVER_RATIO * tq[1]
        # the exact solve the tick ran (post-sliver-splice inputs come from
        # _warm_tick itself; re-run it for solved, then the raw QP for
        # residual detail)
        solved, _, _, _ = driver_lib._warm_tick(cfg, 1.0 / 10.0, 0, False,
                                                state9, hp, seg, prev)
        data = qp.build_qp(cfg.qp, state9, hp, jnp.asarray(tq)[None], seg)
        x0 = qp.scale_coeffs(data, prev.coeffs)
        sol = admm.solve_qp(data, scfg_w, x0=x0)
        print(f"mission {mission} tick {k}: seg={snap['seg']} "
              f"times={np.round(tq[:snap['seg']], 3)} sliver={sliver} "
              f"resolved_now={bool(np.asarray(solved)[0])} "
              f"raw pri_rel={float(sol.pri_rel[0]):.2e} "
              f"dua_rel={float(sol.dua_rel[0]):.2e} "
              f"polished={bool(sol.polished[0])}", flush=True)


if __name__ == "__main__":
    main()
