"""Ablation study: differentiable-QP training vs supervised-time-only.

The paper's core ablation (reference `_as` trainers pin w1=0, wt=1, wc=0,
wp=0 -- train_minsnap_conv_mlp_as.py:135-139): does back-propagating THROUGH
the QP (time-factor + normalized-cost losses via the KKT implicit gradients)
beat plain supervised regression onto the reference times?

Arms (ConvLSTM h=256, the flagship architecture, on the full 50k corpus at
the exact runs/big operating point):

  qp_grad    -- runs/big itself (w1=17.5, wc=0.1, wt fallback, wp=20):
                never-seen-map success 79.8% (runs/big/eval_fresh.json).
  supervised -- this script: w1=0, wc=0 (QP gradient path off), wt=1
                supervised time MSE, wp=20 kept so the stop-token head still
                trains (the LSTM needs it to emit segment counts at all; the
                reference's MLP `_as` variant has no tokens to keep).

A 15-epoch/10k MLP probe of the same comparison was inconclusive: BOTH
arms collapsed to ~0.68 time ratio / 0% success (the ConvMLP head does not
fit the time targets at that budget), recorded in runs/ablation/mlp_probe/.

    nohup python scripts/train_ablation.py > runs/ablation/train_lstm.log 2>&1 &
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from allocnet_tpu import config as config_lib
from allocnet_tpu.config import (AllocNetConfig, LossConfig, ModelConfig,
                                 QPConfig, SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import dataset as ds_lib, evaluate, trainer as trainer_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

WORKDIR = "/root/repo/runs/ablation"

# the exact runs/big operating point, with the QP-gradient losses OFF
cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
    train=TrainConfig(batch_size=128, max_epochs=50, learning_rate=1e-3,
                      t0=3000, t_mult=2, save_freq=10),
    model=ModelConfig(hidden_size=256),
    loss=LossConfig(w1=0.0, wt=1.0, wc=0.0, wp=20.0),
)


def main():
    wd = os.path.join(WORKDIR, "supervised_lstm")
    os.makedirs(wd, exist_ok=True)

    z = np.load("/root/repo/data/big_combined.npz")
    sc = ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                       times=z["times"], seg=z["seg"])
    ze = np.load("/root/repo/data/eval_fresh.npz")
    ev = ScenarioBatch(state=ze["state"], hpolys=ze["hpolys"],
                       times=ze["times"], seg=ze["seg"])
    print(f"train {sc.state.shape[0]} / eval {ev.state.shape[0]}", flush=True)

    loader = ds_lib.Loader(sc, batch_size=cfg.train.batch_size, seed=0)
    net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                           hidden_size=cfg.model.hidden_size,
                           token_thresh=cfg.model.token_thresh)
    tr = trainer_lib.Trainer(cfg, net, loader, wd)
    print(f"training from epoch {tr.start_epoch}", flush=True)
    tr.train()

    eval_cfg = dataclasses.replace(
        cfg, solver=SolverConfig(polish_rounds=4, iters_per_chunk=250))
    rep = evaluate.evaluate(net, tr.ts.params, eval_cfg, ev)
    sup = dict(rep._asdict(), arm="supervised_lstm")
    print(json.dumps(sup), flush=True)

    with open("/root/repo/runs/big/eval_fresh.json") as f:
        qp_grad = json.load(f)

    results = {"qp_grad": qp_grad, "supervised": sup}
    with open(os.path.join(WORKDIR, "results.json"), "w") as f:
        json.dump(results, f, indent=1)

    q, s = qp_grad, sup
    with open(os.path.join(WORKDIR, "README.md"), "w") as f:
        f.write(
            "# Ablation: differentiable-QP loss vs supervised-time-only\n\n"
            "Same 50k-sample corpus (data/big), same ConvLSTM h=256 /"
            " schedule / 50 epochs; held-out fresh-map eval (2k scenarios,"
            " disjoint map seeds) at the certification solver budget.\n"
            "Reference anchor: train_minsnap_conv_mlp_as.py:135-139.\n\n"
            "| arm | success | stop-token acc | mean time ratio |\n"
            "|---|---|---|---|\n"
            f"| QP-gradient (w1=17.5, wc=0.1; runs/big) | "
            f"{q['success_rate']:.3f} | {q['stop_token_accuracy']:.3f} | "
            f"{q['mean_time_ratio']:.3f} |\n"
            f"| supervised-only (wt=1, QP grads off) | "
            f"{s['success_rate']:.3f} | {s['stop_token_accuracy']:.3f} | "
            f"{s['mean_time_ratio']:.3f} |\n\n"
            "A 15-epoch/10k ConvMLP probe of the same comparison collapsed "
            "in BOTH arms (~0.68 time ratio, 0% success) -- see "
            "mlp_probe/.\n")
    print("done", flush=True)


if __name__ == "__main__":
    main()
