"""Diagnose failing ticks at the DEPLOY operating point (res=20, v4/a6).

Flies drive_eval-style missions on CPU (fast compiles; solver math is
f32-pinned so solve behavior matches TPU) and post-mortems every failing
tick: cold or warm, sliver state, residuals under (a) the warm budget,
(b) the full cold budget, (c) the certification budget — to see whether
the failures are budget-bound or genuinely hard.  Analysis tool.

Usage: python scripts/debug_deploy_ticks.py [n_maps per_map max_ticks]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig, CERTIFY_SOLVER
from allocnet_tpu.models import import_torch
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.planner import driver as driver_lib
from allocnet_tpu.planner import planner as planner_lib
from allocnet_tpu.planner import replan
from allocnet_tpu.train import datagen
from scripts.drive_eval import sample_missions, EXTENT


def main():
    n_maps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    per_map = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    max_ticks = int(sys.argv[3]) if len(sys.argv) > 3 else 400

    cfg = AllocNetConfig()
    lo, hi = np.zeros(3), np.asarray(EXTENT)
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(jnp.asarray, import_torch.load_torchscript_lstm(
        "/root/reference/src/planner/models/seq5_tokenthresh0_35_cpu.pt"))
    drv = driver_lib.Driver(net, params, cfg, rate_hz=10.0)
    drv.prewarm()
    # post-mortems must rebuild the QP exactly as the tick programs do:
    # the driver solves against margin-tightened box limits (cfg_tick)
    qcfg_tick = drv.cfg_tick.qp

    failures = []
    rng = np.random.default_rng(12345)
    total_ticks = 0
    for mi in range(n_maps):
        pts = datagen.random_obstacle_map(100 + mi, EXTENT)
        pmap = planner_lib.build_map(pts, lo, hi, scale=0.25, dilate_r=2)
        for start, cp in sample_missions(pmap, cfg, rng, per_map, lo, hi):
            st = drv.reset(start, cp.route[-1], cp.hpolys, cp.seg)
            for k in range(max_ticks):
                if st.done:
                    break
                warm = bool(np.asarray(st.prev.have_prev)[0])
                snap = dict(state9=drv._pack_state9(st),
                            hpolys=st.hpolys.copy(), seg=st.seg,
                            warm=warm,
                            prev_coeffs=np.asarray(st.prev.coeffs),
                            prev_times=np.asarray(st.prev.times),
                            prev_duals=jax.tree.map(np.asarray,
                                                    st.prev.duals))
                r = drv.tick(st)
                total_ticks += 1
                if not r.solved:
                    failures.append((mi, k, snap))
                st = r.state
            print(f"map {mi} mission done: ticks to here {total_ticks}, "
                  f"failures {len(failures)}, arrived={st.done}", flush=True)

    print(f"\n{len(failures)} failing ticks / {total_ticks}", flush=True)
    # persist snapshots for exact repro harnesses
    import pickle
    with open("/tmp/deploy_tick_failures.pkl", "wb") as f:
        pickle.dump(failures, f)
    S = cfg.qp.max_seg
    scfg_w = replan.warm_solver_config(cfg.solver)
    for mi, k, snap in failures[:40]:
        state9 = jnp.asarray(snap["state9"])
        hp = jnp.asarray(snap["hpolys"], jnp.float32)[None]
        seg = jnp.asarray([snap["seg"]])
        mask = (np.arange(S) < snap["seg"]).astype(np.float32)
        tq = np.where(mask > 0, np.maximum(snap["prev_times"][0], 0.05), 1.0)
        sliver = (snap["seg"] > 1
                  and tq[0] < driver_lib.SLIVER_RATIO * tq[1])
        line = (f"map {mi} tick {k}: warm={snap['warm']} seg={snap['seg']} "
                f"t={np.round(tq[:snap['seg']], 3)} sliver={sliver}")
        if snap["warm"]:
            data = qp.build_qp(qcfg_tick, state9, hp, jnp.asarray(tq)[None], seg)
            x0 = qp.scale_coeffs(data, jnp.asarray(snap["prev_coeffs"]))
            y0 = jax.tree.map(jnp.asarray, snap["prev_duals"])
            for name, scfg, xx, yy in (
                    ("warm+y0", scfg_w, x0, y0),
                    ("warm2x+y0", dataclasses.replace(
                        scfg_w, iters_per_chunk=150), x0, y0),
                    ("certify", CERTIFY_SOLVER, None, None)):
                sol = admm.solve_qp(data, scfg, x0=xx, y0=yy)
                line += (f" | {name}: solved={bool(sol.solved[0])} "
                         f"pri={float(sol.pri_res[0]):.1e} "
                         f"dua={float(sol.dua_res[0]):.1e} "
                         f"obj={float(sol.obj[0]):.2f}")
        else:
            # replicate the cold hedge per scale at the cold budget
            from allocnet_tpu.models import packing
            out = net.apply(params, packing.pack_state(state9),
                            packing.pack_hpolys(hp))
            tnet, _ = out if isinstance(out, tuple) else (out, None)
            scfg_c = replan.cold_solver_config(cfg.solver)
            for s in driver_lib.HEDGE_SCALES:
                tqs = np.where(mask > 0,
                               np.maximum(np.asarray(tnet)[0] * s, 0.05), 1.0)
                d = qp.build_qp(qcfg_tick, state9, hp,
                                jnp.asarray(tqs, jnp.float32)[None], seg)
                sol = admm.solve_qp(d, scfg_c)
                line += (f" | s={s}: solved={bool(sol.solved[0])} "
                         f"pri={float(sol.pri_res[0]):.1e} "
                         f"dua={float(sol.dua_res[0]):.1e} "
                         f"obj={float(sol.obj[0]):.2f}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
