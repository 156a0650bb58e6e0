"""Post-init-fix re-run of the ConvMLP ablation probe.

The original probe (runs/ablation/mlp_probe) collapsed in BOTH arms (0%
success, one dead softplus slot) — root-caused to the wrong-axis fan_in
init (commit cc115fe). This re-runs the identical probe from the corrected
init: ConvMLPAllocNet h=256, first 10k samples of data/big, 15 epochs,
QP-gradient arm vs supervised-time-only arm (the reference's `_as` MLP
ablation, train_minsnap_conv_mlp_as.py:135-139), eval on data/eval_fresh.

Note the MLP (like the reference's) has no stop-token head: it always emits
max_seg times, so `stop_token_accuracy` is only meaningful for 5-segment
scenarios and the interesting metrics are success on the predicted times
and the time ratio.

Run:
    cd /root/repo && nohup python scripts/mlp_probe.py \
        > runs/ablation/mlp_probe2/train.log 2>&1 &
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from allocnet_tpu.config import (AllocNetConfig, LossConfig, ModelConfig,
                                 QPConfig, SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvMLPAllocNet
from allocnet_tpu.train import dataset as ds_lib, evaluate, trainer as trainer_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

WORKDIR = "/root/repo/runs/ablation/mlp_probe2"

ARMS = {
    # runs/big loss weights with the QP-gradient path on
    "qp_grad": LossConfig(w1=17.5, wt=1200.0, wc=0.1, wp=0.0),
    # the reference `_as` trainer pins w1=0, wt=1, wc=0, wp=0
    "supervised": LossConfig(w1=0.0, wt=1.0, wc=0.0, wp=0.0),
}


def main():
    z = np.load("/root/repo/data/big_combined.npz")
    sc = ScenarioBatch(state=z["state"][:10000], hpolys=z["hpolys"][:10000],
                       times=z["times"][:10000], seg=z["seg"][:10000])
    ze = np.load("/root/repo/data/eval_fresh.npz")
    ev = ScenarioBatch(state=ze["state"], hpolys=ze["hpolys"],
                       times=ze["times"], seg=ze["seg"])
    print(f"train {sc.state.shape[0]} / eval {ev.state.shape[0]}", flush=True)

    results = {}
    for arm, loss in ARMS.items():
        wd = os.path.join(WORKDIR, arm)
        os.makedirs(wd, exist_ok=True)
        cfg = AllocNetConfig(
            qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
            solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
            train=TrainConfig(batch_size=128, max_epochs=15,
                              learning_rate=1e-3, t0=3000, t_mult=2,
                              save_freq=5),
            model=ModelConfig(hidden_size=256),
            loss=loss,
        )
        loader = ds_lib.Loader(sc, batch_size=cfg.train.batch_size, seed=0)
        net = ConvMLPAllocNet(seg=cfg.qp.max_seg, seq_len=cfg.model.seq_len,
                              hidden_size=cfg.model.hidden_size)
        tr = trainer_lib.Trainer(cfg, net, loader, wd)
        print(f"[{arm}] training from epoch {tr.start_epoch}", flush=True)
        tr.train()

        eval_cfg = dataclasses.replace(
            cfg, solver=SolverConfig(polish_rounds=4, iters_per_chunk=250))
        rep = evaluate.evaluate(net, tr.ts.params, eval_cfg, ev)
        results[arm] = dict(rep._asdict())
        print(f"[{arm}] {json.dumps(results[arm])}", flush=True)

    with open(os.path.join(WORKDIR, "results.json"), "w") as f:
        json.dump(results, f, indent=1)

    q, s = results["qp_grad"], results["supervised"]
    with open(os.path.join(WORKDIR, "README.md"), "w") as f:
        f.write(
            "# MLP ablation probe (post-init-fix)\n\n"
            "Re-run of runs/ablation/mlp_probe after the fan_in init fix "
            "(commit cc115fe): ConvMLP h=256, 10k samples, 15 epochs, "
            "eval on data/eval_fresh (never-seen maps). The pre-fix probe "
            "collapsed to 0% success in both arms via a dead softplus "
            "slot.\n\n"
            "| arm | success | mean time ratio | mean obj |\n"
            "|---|---|---|---|\n"
            f"| QP-gradient | {q['success_rate']:.3f} | "
            f"{q['mean_time_ratio']:.3f} | {q['mean_obj']:.4f} |\n"
            f"| supervised-only | {s['success_rate']:.3f} | "
            f"{s['mean_time_ratio']:.3f} | {s['mean_obj']:.4f} |\n")
    print("done", flush=True)


if __name__ == "__main__":
    main()
