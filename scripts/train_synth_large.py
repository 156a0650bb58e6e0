"""Larger synthetic training run: 2048 samples over 24 maps, 60 epochs."""
import time, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
t0 = time.time()
from allocnet_tpu.config import (AllocNetConfig, QPConfig, SolverConfig,
                                 TrainConfig, ModelConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import datagen, dataset as ds_lib, trainer as trainer_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
    train=TrainConfig(batch_size=32, max_epochs=60, learning_rate=5e-4,
                      save_freq=5),
    model=ModelConfig(hidden_size=128),
)

dpath = "/root/repo/runs/synth2k/dataset.h5"
if not os.path.exists(dpath):
    print("generating dataset...", flush=True)
    all_sc = []
    for mseed in range(24):
        sc = datagen.generate(cfg, n_samples=86, points=None, seed=100 + mseed)
        all_sc.append(sc)
        print(f"map {mseed}: {sc.state.shape[0]} samples, {time.time()-t0:.0f}s",
              flush=True)
    sc = ScenarioBatch(
        state=np.concatenate([s.state for s in all_sc]),
        hpolys=np.concatenate([s.hpolys for s in all_sc]),
        times=np.concatenate([s.times for s in all_sc]),
        seg=np.concatenate([s.seg for s in all_sc]))
    ds_lib.write_h5(dpath, sc)
    print("dataset written:", sc.state.shape[0], flush=True)

sc = ds_lib.read_h5(dpath, cfg.qp)
print("dataset:", sc.state.shape[0], "seg dist:", np.bincount(sc.seg), flush=True)
loader = ds_lib.Loader(sc, batch_size=32, seed=0)
net = ConvLSTMAllocNet(seq_len=5, hidden_size=128, token_thresh=0.42)
tr = trainer_lib.Trainer(cfg, net, loader, "/root/repo/runs/synth2k")
print(f"setup {time.time()-t0:.0f}s; training...", flush=True)
tr.train()
print("DONE", int(tr.ts.step), flush=True)
