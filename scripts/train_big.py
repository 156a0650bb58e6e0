"""Reference-grade training run on the big multi-map dataset (VERDICT #3/#4).

Reads every shard in data/big (gen_dataset.py output), trains the ConvLSTM
time-allocation network at the reference operating point (hidden 256, cosine
warm restarts, 50 epochs — train_minsnap_conv_lstm.py:24-332) with the
differentiable-QP loss, then evaluates on NEVER-SEEN maps.

Run (long job):
    cd /root/repo && nohup python scripts/train_big.py > runs/big/train.log 2>&1 &
Resume is automatic (Trainer restores the latest checkpoint).
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t0 = time.time()

from allocnet_tpu.config import (AllocNetConfig, ModelConfig, QPConfig,
                                 SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import dataset as ds_lib, trainer as trainer_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

WORKDIR = "/root/repo/runs/big"
SHARDS = sorted(glob.glob("/root/repo/data/big/shard_*.h5"))
CACHE = "/root/repo/data/big_combined.npz"

cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),      # TRAIN operating point
    solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
    train=TrainConfig(batch_size=128, max_epochs=50, learning_rate=1e-3,
                      t0=3000, t_mult=2, save_freq=2),
    model=ModelConfig(hidden_size=256),
)


def load_all() -> ScenarioBatch:
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                             times=z["times"], seg=z["seg"])
    parts = []
    for p in SHARDS:
        parts.append(ds_lib.read_h5(p, cfg.qp))
        if len(parts) % 20 == 0:
            print(f"read {len(parts)}/{len(SHARDS)} shards "
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
    print(f"dataset: {n} samples from {len(SHARDS)} maps, "
          f"seg dist {np.bincount(sc.seg).tolist()} ({time.time()-t0:.0f}s)",
          flush=True)
    with open(os.path.join(WORKDIR, "dataset.json"), "w") as f:
        json.dump({"n": int(n), "shards": len(SHARDS),
                   "seg_hist": np.bincount(sc.seg).tolist()}, f)

    loader = ds_lib.Loader(sc, batch_size=cfg.train.batch_size, seed=0)
    net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                           hidden_size=cfg.model.hidden_size,
                           token_thresh=cfg.model.token_thresh)
    tr = trainer_lib.Trainer(cfg, net, loader, WORKDIR)
    print(f"setup done {time.time()-t0:.0f}s; training from epoch "
          f"{tr.start_epoch}...", flush=True)
    tr.train()
    print("DONE step", int(tr.ts.step), flush=True)


if __name__ == "__main__":
    main()
