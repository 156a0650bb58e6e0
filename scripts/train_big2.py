"""Flagship retrain after the weight-init fix (commit cc115fe).

Identical operating point to runs/big (ConvLSTM h=256, 50k corpus, 50
epochs, differentiable-QP loss) so the comparison isolates the init change:
runs/big was trained with kaiming fans computed on the wrong axis for
torch-layout weights (w_ih got std 0.044 instead of 0.23, the time/stop
heads 3.2x undersized) — runs/big2 trains from a correctly-scaled init.

Run (long job):
    cd /root/repo && nohup python scripts/train_big2.py > runs/big2/train.log 2>&1 &
Resume is automatic (Trainer restores the latest checkpoint).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from allocnet_tpu.config import (AllocNetConfig, ModelConfig, QPConfig,
                                 SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import dataset as ds_lib, trainer as trainer_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

WORKDIR = "/root/repo/runs/big2"

cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),      # TRAIN operating point
    solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
    train=TrainConfig(batch_size=128, max_epochs=50, learning_rate=1e-3,
                      t0=3000, t_mult=2, save_freq=2),
    model=ModelConfig(hidden_size=256),
)


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    z = np.load("/root/repo/data/big_combined.npz")
    sc = ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                       times=z["times"], seg=z["seg"])
    n = sc.state.shape[0]
    print(f"dataset: {n} samples, seg dist {np.bincount(sc.seg).tolist()}",
          flush=True)
    with open(os.path.join(WORKDIR, "dataset.json"), "w") as f:
        json.dump({"n": int(n), "seg_hist": np.bincount(sc.seg).tolist(),
                   "source": "data/big_combined.npz (same corpus as runs/big)"},
                  f)

    loader = ds_lib.Loader(sc, batch_size=cfg.train.batch_size, seed=0)
    net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                           hidden_size=cfg.model.hidden_size,
                           token_thresh=cfg.model.token_thresh)
    tr = trainer_lib.Trainer(cfg, net, loader, WORKDIR)
    print(f"training from epoch {tr.start_epoch}...", flush=True)
    tr.train()
    print("DONE step", int(tr.ts.step), flush=True)


if __name__ == "__main__":
    main()
