"""QP-gradient fine-tune from a supervised checkpoint (curriculum).

Round-2 ablation result: supervised-only training wins on held-out success
(85.6% vs 79.8%) but merely reproduces the reference's 2.2x-slack heuristic
times (time ratio 1.008); the QP-gradient objective shortens times but drags
success and stop-token accuracy down when applied from scratch. This script
composes the two — the curriculum the reference's two-phase training hints
at (min_traj_opt.py phase 1 vs 2): start from the best supervised checkpoint
(times feasible, stop head accurate) and fine-tune a few epochs with the
differentiable-QP losses at a reduced LR, so the time head walks DOWN from
the feasible side rather than up from the infeasible one.

Run (after the supervised flagship run finishes):
    cd /root/repo && nohup python scripts/finetune_qp.py \
        > runs/finetune/train.log 2>&1 &
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

WORKDIR = "/root/repo/runs/finetune"
START = "/root/repo/runs/big3/checkpoints"
DATA = "/root/repo/data/big100k_combined.npz"

cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=SolverConfig(n_chunks=2, iters_per_chunk=100),
    train=TrainConfig(batch_size=128, max_epochs=10, learning_rate=2e-4,
                      t0=4000, t_mult=1, save_freq=2),
    model=ModelConfig(hidden_size=256),
    # moderate time pressure: w1 well below the from-scratch 17.5 so the
    # success-preserving supervised solution stays in the basin
    loss=LossConfig(w1=5.0, wt=1200.0, wc=0.1, wp=20.0),
)


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    z = np.load(DATA)
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
    tr = trainer_lib.Trainer(cfg, net, loader, WORKDIR)

    if tr.start_epoch == 0 and int(tr.ts.step) == 0:
        src = trainer_lib.latest_checkpoint(START)
        assert src, f"no supervised checkpoint under {START}"
        restored, _ = trainer_lib.restore_checkpoint(src, tr.ts)
        # params only: fresh optimizer state + schedule at the reduced LR
        # (TrainState is a NamedTuple, not a dataclass)
        tr.ts = tr.ts._replace(params=restored.params)
        print(f"fine-tuning from {src}", flush=True)
    else:
        print(f"resuming fine-tune at epoch {tr.start_epoch}", flush=True)

    tr.train()

    eval_cfg = dataclasses.replace(
        cfg, solver=SolverConfig(polish_rounds=4, iters_per_chunk=250))
    rep = evaluate.evaluate(net, tr.ts.params, eval_cfg, ev)
    out = dict(rep._asdict(), arm="supervised_then_qp_finetune",
               start=trainer_lib.latest_checkpoint(START),
               step=int(tr.ts.step))
    with open(os.path.join(WORKDIR, "eval_fresh.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
