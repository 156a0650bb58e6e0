"""Flagship supervised run on the 100k combined corpus (fixed init).

Round-2 findings feeding this run:
  * supervised-time-only training beat the from-scratch QP-gradient
    objective on never-seen-map success (runs/ablation: 85.6% vs 79.8%);
  * the weight-init fan_in fix (commit cc115fe) corrects undersized LSTM
    input weights (std 0.044 -> 0.23);
  * val-split success plateaus by epoch ~25 on 50k -- the binding
    constraint is data, so this run doubles the corpus (seeds 1000-1199 +
    2000-2xxx, 400 maps total) and trains 35 epochs.

The QP-gradient fine-tune (scripts/finetune_qp.py) then starts from this
checkpoint to shorten times without losing success.

Run:
    cd /root/repo && nohup python scripts/train_big3.py \
        > runs/big3/train.log 2>&1 &
"""

import dataclasses
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from allocnet_tpu.config import (AllocNetConfig, LossConfig, ModelConfig,
                                 QPConfig, SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import dataset as ds_lib, evaluate, trainer as trainer_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

WORKDIR = "/root/repo/runs/big3"
CACHE = "/root/repo/data/big100k_combined.npz"
NEW_SHARDS = "/root/repo/data/big_b/shard_*.h5"

cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
    train=TrainConfig(batch_size=128, max_epochs=35, learning_rate=1e-3,
                      t0=3000, t_mult=2, save_freq=5),
    model=ModelConfig(hidden_size=256),
    loss=LossConfig(w1=0.0, wt=1.0, wc=0.0, wp=20.0),
)


def load_all() -> ScenarioBatch:
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                             times=z["times"], seg=z["seg"])
    t0 = time.time()
    z = np.load("/root/repo/data/big_combined.npz")
    parts = [ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                           times=z["times"], seg=z["seg"])]
    shards = sorted(glob.glob(NEW_SHARDS))
    for i, p in enumerate(shards):
        parts.append(ds_lib.read_h5(p, cfg.qp))
        if (i + 1) % 40 == 0:
            print(f"read {i+1}/{len(shards)} new shards "
                  f"({time.time()-t0:.0f}s)", flush=True)
    sc = ScenarioBatch(
        state=np.concatenate([s.state for s in parts]).astype(np.float32),
        hpolys=np.concatenate([s.hpolys for s in parts]).astype(np.float32),
        times=np.concatenate([s.times for s in parts]).astype(np.float32),
        seg=np.concatenate([s.seg for s in parts]))
    np.savez(CACHE, state=sc.state, hpolys=sc.hpolys, times=sc.times,
             seg=sc.seg)
    return sc


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    sc = load_all()
    n = sc.state.shape[0]
    print(f"dataset: {n} samples, seg dist {np.bincount(sc.seg).tolist()}",
          flush=True)
    with open(os.path.join(WORKDIR, "dataset.json"), "w") as f:
        json.dump({"n": int(n), "seg_hist": np.bincount(sc.seg).tolist(),
                   "sources": ["data/big (seeds 1000-1199)",
                               "data/big_b (seeds 2000+)"]}, f)

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
    out = dict(rep._asdict(), arm="supervised_100k_fixed_init",
               step=int(tr.ts.step))
    with open(os.path.join(WORKDIR, "eval_fresh.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
