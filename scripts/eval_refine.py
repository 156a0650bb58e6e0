"""Quantify MINCO-style time refinement on never-seen-map scenarios.

Loads the committed runs/big3 checkpoint and compares the QP objective of
the network's raw time allocation against the refined one
(planner/refine.py, fixed-total mode: mission duration unchanged).

Default: the FULL 2000-scenario never-seen-map eval set
(data/eval_fresh.npz, seeds 9000+), processed in fixed-size chunks ->
runs/refine/results_full.json.  `--subset` reproduces the round-2
192-scenario quick eval (runs/big3/eval_subset.npz -> results.json).

The reference has no counterpart: it deploys predicted times verbatim
(learning_planner.hpp:174-179).
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
    subset = "--subset" in sys.argv[1:]
    if subset:
        z = np.load(os.path.join(WORKDIR, "eval_subset.npz"))
        out_path, chunk = "runs/refine/results.json", None
    else:
        z = np.load("data/eval_fresh.npz")
        out_path, chunk = "runs/refine/results_full.json", 500
    state_np = z["state"].astype(np.float32)
    hpolys_np = z["hpolys"].astype(np.float32)
    seg_np = z["seg"]
    B, S = z["times"].shape
    chunk = chunk or B

    net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                           hidden_size=cfg.model.hidden_size,
                           token_thresh=cfg.model.token_thresh)
    template = ts_lib.init_state(net, cfg.train,
                                 jnp.asarray(state_np[:1]),
                                 jnp.asarray(hpolys_np[:1]))
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
    def solve_obj(state, hpolys, seg, times):
        data = qp.build_qp(cfg.qp, state, hpolys, times, seg)
        sol = admm.solve_qp(data, cfg.solver)
        return sol.solved, sol.obj

    acc = {k: [] for k in
           ("solved0", "solved1", "obj0", "obj1", "improved", "ts0", "ts1")}
    assert B % chunk == 0, (B, chunk)
    for c0 in range(0, B, chunk):
        sl = slice(c0, c0 + chunk)
        state = jnp.asarray(state_np[sl])
        hpolys = jnp.asarray(hpolys_np[sl])
        seg = jnp.asarray(seg_np[sl])
        t0 = net_times(state, hpolys, seg)
        solved0, obj0 = solve_obj(state, hpolys, seg, t0)
        res = refine.refine_times(cfg.qp, cfg.solver, state, hpolys, t0, seg,
                                  steps=STEPS)
        seg_mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(t0.dtype)
        t1 = res.times + (1.0 - seg_mask)
        solved1, obj1 = solve_obj(state, hpolys, seg, t1)
        for k, v in (("solved0", solved0), ("solved1", solved1),
                     ("obj0", obj0), ("obj1", obj1),
                     ("improved", res.improved),
                     ("ts0", jnp.sum(t0 * seg_mask, axis=1)),
                     ("ts1", jnp.sum(res.times * seg_mask, axis=1))):
            acc[k].append(np.asarray(v))
        print(json.dumps({"chunk_done": c0 // chunk + 1,
                          "of": B // chunk}), flush=True)

    solved0, solved1, obj0, obj1, improved, tsum0, tsum1 = (
        np.concatenate(acc[k]) for k in
        ("solved0", "solved1", "obj0", "obj1", "improved", "ts0", "ts1"))
    both = solved0 & solved1
    rel = (obj0[both] - obj1[both]) / np.maximum(obj0[both], 1e-9)

    out = {
        "n": int(B), "steps": STEPS, "subset": subset,
        "checkpoint": os.path.basename(path),
        "success_rate_net": float(solved0.mean()),
        "success_rate_refined": float(solved1.mean()),
        "n_both_solved": int(both.sum()),
        "improved_frac": float(improved[both].mean()),
        "rel_obj_reduction_mean": float(rel.mean()),
        "rel_obj_reduction_median": float(np.median(rel)),
        "rel_obj_reduction_p90": float(np.percentile(rel, 90)),
        "total_time_max_rel_drift": float(
            np.max(np.abs(tsum1 - tsum0)[solved0] / tsum0[solved0])),
    }
    os.makedirs("runs/refine", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
