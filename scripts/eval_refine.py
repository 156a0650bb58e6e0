"""Quantify MINCO-style time refinement on the flagship eval subset.

Loads the committed runs/big3 checkpoint and the 192-scenario never-seen-map
eval subset (runs/big3/eval_subset.npz), then compares the QP objective of
the network's raw time allocation against the refined one
(planner/refine.py, fixed-total mode: mission duration unchanged).

The reference has no counterpart: it deploys predicted times verbatim
(learning_planner.hpp:174-179).  Writes runs/refine/results.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from allocnet_tpu.config import (AllocNetConfig, CERTIFY_SOLVER, ModelConfig,
                                 QPConfig, TrainConfig)
from allocnet_tpu.models import packing
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.planner import refine
from allocnet_tpu.train import trainer as trainer_lib
from allocnet_tpu.train import train_step as ts_lib

WORKDIR = "runs/big3"
STEPS = 6

cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=CERTIFY_SOLVER,
    train=TrainConfig(batch_size=128),
    model=ModelConfig(hidden_size=256),
)


def main():
    z = np.load(os.path.join(WORKDIR, "eval_subset.npz"))
    state = jnp.asarray(z["state"], jnp.float32)
    hpolys = jnp.asarray(z["hpolys"], jnp.float32)
    seg = jnp.asarray(z["seg"])
    B, S = z["times"].shape

    net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                           hidden_size=cfg.model.hidden_size,
                           token_thresh=cfg.model.token_thresh)
    template = ts_lib.init_state(net, cfg.train, state[:1], hpolys[:1])
    path = trainer_lib.latest_checkpoint(os.path.join(WORKDIR, "checkpoints"))
    ts, _ = trainer_lib.restore_checkpoint(path, template)

    @jax.jit
    def net_times(state, hpolys, seg):
        out = net.apply(ts.params, packing.pack_state(state),
                        packing.pack_hpolys(hpolys))
        times = out[0] if isinstance(out, tuple) else out
        seg_mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(times.dtype)
        return jnp.where(seg_mask > 0, jnp.maximum(times, 0.05), 1.0)

    @jax.jit
    def solve_obj(times):
        data = qp.build_qp(cfg.qp, state, hpolys, times, seg)
        sol = admm.solve_qp(data, cfg.solver)
        return sol.solved, sol.obj

    t0 = net_times(state, hpolys, seg)
    solved0, obj0 = solve_obj(t0)

    res = refine.refine_times(cfg.qp, cfg.solver, state, hpolys, t0, seg,
                              steps=STEPS)
    seg_mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(t0.dtype)
    t1 = res.times + (1.0 - seg_mask)
    solved1, obj1 = solve_obj(t1)

    solved0 = np.asarray(solved0); solved1 = np.asarray(solved1)
    obj0 = np.asarray(obj0); obj1 = np.asarray(obj1)
    both = solved0 & solved1
    rel = (obj0[both] - obj1[both]) / np.maximum(obj0[both], 1e-9)
    tsum0 = np.asarray(jnp.sum(t0 * seg_mask, axis=1))
    tsum1 = np.asarray(jnp.sum(res.times * seg_mask, axis=1))

    out = {
        "n": int(B), "steps": STEPS,
        "checkpoint": os.path.basename(path),
        "success_rate_net": float(solved0.mean()),
        "success_rate_refined": float(solved1.mean()),
        "n_both_solved": int(both.sum()),
        "improved_frac": float(np.asarray(res.improved)[both].mean()),
        "rel_obj_reduction_mean": float(rel.mean()),
        "rel_obj_reduction_median": float(np.median(rel)),
        "rel_obj_reduction_p90": float(np.percentile(rel, 90)),
        "total_time_max_rel_drift": float(
            np.max(np.abs(tsum1 - tsum0)[solved0] / tsum0[solved0])),
    }
    os.makedirs("runs/refine", exist_ok=True)
    with open("runs/refine/results.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
