"""Self-distillation stage 2: retrain the flagship on REFINED time targets.

Controlled comparison against runs/big3: identical architecture, init seed,
schedule, epochs, and corpus — the ONLY change is that the supervision
`times` were improved by implicit-gradient refinement
(scripts/refine_targets.py: snap cost lowered at conserved total duration).
If the refined targets distill, runs/big4 should match big3's success rate
with a lower mean QP objective at the same predicted durations.

Run:
    cd /root/repo && nohup python scripts/train_big4.py \
        > runs/big4/train.log 2>&1 &
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from allocnet_tpu.config import (AllocNetConfig, LossConfig, ModelConfig,
                                 QPConfig, SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import dataset as ds_lib, evaluate, trainer as trainer_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

WORKDIR = "/root/repo/runs/big4"
DATA = "/root/repo/data/big100k_refined.npz"

# identical to scripts/train_big3.py on purpose (controlled comparison)
cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
    train=TrainConfig(batch_size=128, max_epochs=35, learning_rate=1e-3,
                      t0=3000, t_mult=2, save_freq=5),
    model=ModelConfig(hidden_size=256),
    loss=LossConfig(w1=0.0, wt=1.0, wc=0.0, wp=20.0),
)


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    z = np.load(DATA)
    sc = ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                       times=z["times"], seg=z["seg"])
    n = sc.state.shape[0]
    print(f"dataset: {n} refined-target samples", flush=True)
    with open(os.path.join(WORKDIR, "dataset.json"), "w") as f:
        json.dump({"n": int(n), "source": DATA,
                   "targets": "refined (scripts/refine_targets.py)"}, f)

    loader = ds_lib.Loader(sc, batch_size=cfg.train.batch_size, seed=0)
    net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                           hidden_size=cfg.model.hidden_size,
                           token_thresh=cfg.model.token_thresh)
    tr = trainer_lib.Trainer(cfg, net, loader, WORKDIR)
    print(f"training from epoch {tr.start_epoch}", flush=True)
    tr.train()

    ze = np.load("/root/repo/data/eval_fresh.npz")
    ev = ScenarioBatch(state=ze["state"], hpolys=ze["hpolys"],
                       times=ze["times"], seg=ze["seg"])
    eval_cfg = dataclasses.replace(
        cfg, solver=SolverConfig(polish_rounds=4, iters_per_chunk=250))
    rep = evaluate.evaluate(net, tr.ts.params, eval_cfg, ev)
    out = dict(rep._asdict(), arm="distilled_refined_targets",
               step=int(tr.ts.step))
    with open(os.path.join(WORKDIR, "eval_fresh.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
