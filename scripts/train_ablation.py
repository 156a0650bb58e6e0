"""Ablation study: differentiable-QP training vs supervised-time-only.

The paper's core ablation (reference `_as` trainers pin w1=0, wt=1, wc=0,
wp=0 on the MLP variant -- train_minsnap_conv_mlp_as.py:135-139): does
back-propagating THROUGH the QP (time-factor + normalized-cost losses via
the KKT implicit gradients) beat plain supervised regression onto the
reference times?

Runs both arms on the SAME 10k-sample subset of data/big with the same seed
and schedule (ConvMLPAllocNet, the reference's ablation network), evaluates
both on the held-out fresh-map set (data/eval_fresh.npz), and writes
runs/ablation/README.md + metrics.

    nohup python scripts/train_ablation.py > runs/ablation/train.log 2>&1 &
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from allocnet_tpu import config as config_lib
from allocnet_tpu.config import (AllocNetConfig, ModelConfig, QPConfig,
                                 SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvMLPAllocNet
from allocnet_tpu.train import dataset as ds_lib, evaluate, trainer as trainer_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

WORKDIR = "/root/repo/runs/ablation"
N_SAMPLES = 10000
EPOCHS = 15

base = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
    train=TrainConfig(batch_size=128, max_epochs=EPOCHS, learning_rate=1e-3,
                      t0=600, t_mult=2, save_freq=5),
    model=ModelConfig(hidden_size=256),
)

ARMS = {
    # full differentiable-QP loss (deploy training objective)
    "qp_grad": base,
    # reference ablation: supervised time MSE only, QP gradient path off
    "supervised": dataclasses.replace(base,
                                      loss=config_lib.ABLATION_SUPERVISED),
}


def load_subset() -> ScenarioBatch:
    z = np.load("/root/repo/data/big_combined.npz")
    rng = np.random.default_rng(7)
    idx = rng.permutation(z["state"].shape[0])[:N_SAMPLES]
    return ScenarioBatch(state=z["state"][idx], hpolys=z["hpolys"][idx],
                         times=z["times"][idx], seg=z["seg"][idx])


def fresh() -> ScenarioBatch:
    z = np.load("/root/repo/data/eval_fresh.npz")
    return ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                         times=z["times"], seg=z["seg"])


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    sc = load_subset()
    ev = fresh()
    print(f"train {sc.state.shape[0]} / eval {ev.state.shape[0]}", flush=True)

    results = {}
    for arm, cfg in ARMS.items():
        wd = os.path.join(WORKDIR, arm)
        loader = ds_lib.Loader(sc, batch_size=cfg.train.batch_size, seed=0)
        net = ConvMLPAllocNet(seg=cfg.qp.max_seg, seq_len=cfg.model.seq_len,
                              hidden_size=cfg.model.hidden_size)
        tr = trainer_lib.Trainer(cfg, net, loader, wd)
        print(f"[{arm}] training from epoch {tr.start_epoch}", flush=True)
        tr.train()
        # strong-budget eval so success measures time quality, not iterations
        eval_cfg = dataclasses.replace(
            cfg, solver=SolverConfig(polish_rounds=4, iters_per_chunk=250))
        rep = evaluate.evaluate(net, tr.ts.params, eval_cfg, ev)
        results[arm] = rep._asdict()
        print(f"[{arm}] {json.dumps(results[arm])}", flush=True)

    with open(os.path.join(WORKDIR, "results.json"), "w") as f:
        json.dump(results, f, indent=1)

    q, s = results["qp_grad"], results["supervised"]
    with open(os.path.join(WORKDIR, "README.md"), "w") as f:
        f.write(
            "# Ablation: differentiable-QP loss vs supervised-time-only\n\n"
            f"Same {N_SAMPLES}-sample subset of data/big, same seed/schedule, "
            f"{EPOCHS} epochs, ConvMLPAllocNet(h=256); held-out fresh-map "
            "eval (data/eval_fresh.npz) at the certification solver budget.\n"
            "Reference anchor: train_minsnap_conv_mlp_as.py:135-139.\n\n"
            "| arm | success | mean time ratio | mean obj |\n"
            "|---|---|---|---|\n"
            f"| QP-gradient (w1,wc on) | {q['success_rate']:.3f} | "
            f"{q['mean_time_ratio']:.3f} | {q['mean_obj']:.4f} |\n"
            f"| supervised-only (wt only) | {s['success_rate']:.3f} | "
            f"{s['mean_time_ratio']:.3f} | {s['mean_obj']:.4f} |\n")
    print("done", flush=True)


if __name__ == "__main__":
    main()
