"""Calibrate the LSTM stop-token threshold on a held-out validation set.

The reference deploys two thresholds (0.42 at train time, 0.35 for the
`tokenthresh0_35` checkpoints — minsnap_network_conv_lstm.py:276-277,
layers.py:197) but never says how they were picked. Failure analysis of
runs/big shows early stop-tokens are the dominant error mode, so the
threshold is a free post-training knob worth calibrating: sweep it on a
VALIDATION set (fresh map seeds, disjoint from train AND from the reported
eval_fresh set), pick the success-maximizing value, then report eval_fresh
once at that value.

    python scripts/calibrate_thresh.py --run runs/big2
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from allocnet_tpu.config import (AllocNetConfig, ModelConfig, QPConfig,
                                 SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import datagen, evaluate, trainer as trainer_lib
from allocnet_tpu.train import train_step as ts_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

VAL_PATH = "/root/repo/data/val_fresh.npz"
VAL_SEED0 = 20000   # disjoint from train (1000-1199) and eval_fresh (9000+)


def get_val(n: int = 1000) -> ScenarioBatch:
    if os.path.exists(VAL_PATH):
        z = np.load(VAL_PATH)
        return ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                             times=z["times"], seg=z["seg"])
    gen_cfg = AllocNetConfig()        # datagen op point (matches eval_fresh)
    parts, got, mi = [], 0, 0
    while got < n and mi < 40:
        mseed = VAL_SEED0 + mi
        mi += 1
        plain = (mseed % 100) < 30    # same pillar/varied mix as gen_dataset
        points = (datagen.random_pillar_map(mseed) if plain
                  else datagen.random_obstacle_map(mseed))
        sc = datagen.generate(gen_cfg, min(400, n - got), points=points,
                              seed=mseed)
        parts.append(sc)
        got += sc.state.shape[0]
        print(f"val map {mseed}: {sc.state.shape[0]} certified ({got}/{n})",
              flush=True)
    sc = ScenarioBatch(
        state=np.concatenate([s.state for s in parts]).astype(np.float32),
        hpolys=np.concatenate([s.hpolys for s in parts]).astype(np.float32),
        times=np.concatenate([s.times for s in parts]).astype(np.float32),
        seg=np.concatenate([s.seg for s in parts]))
    np.savez(VAL_PATH, state=sc.state, hpolys=sc.hpolys, times=sc.times,
             seg=sc.seg)
    return sc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/big2")
    ap.add_argument("--sweep",
                    default="0.30,0.35,0.40,0.42,0.45,0.50,0.55,0.60")
    args = ap.parse_args()

    cfg = AllocNetConfig(
        qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
        solver=SolverConfig(polish_rounds=4, iters_per_chunk=250),
        train=TrainConfig(batch_size=128),
        model=ModelConfig(hidden_size=256),
    )

    val = get_val()
    print(f"val set: {val.state.shape[0]} scenarios", flush=True)

    path = trainer_lib.latest_checkpoint(
        os.path.join(args.run, "checkpoints"))
    assert path, f"no checkpoint under {args.run}"
    s0 = jnp.asarray(val.state[:1], jnp.float32)
    h0 = jnp.asarray(val.hpolys[:1], jnp.float32)

    rows = []
    for th in [float(t) for t in args.sweep.split(",")]:
        net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                               hidden_size=cfg.model.hidden_size,
                               token_thresh=th)
        template = ts_lib.init_state(net, cfg.train, s0, h0)
        ts, epoch = trainer_lib.restore_checkpoint(path, template)
        ecfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, token_thresh=th))
        rep = evaluate.evaluate(net, ts.params, ecfg, val)
        row = dict(rep._asdict(), token_thresh=th)
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: (r["success_rate"],
                                    r["stop_token_accuracy"]))
    out = {"checkpoint": os.path.basename(path), "epoch": epoch,
           "val_seed0": VAL_SEED0, "n_val": int(val.state.shape[0]),
           "sweep": rows, "best": best}
    opath = os.path.join(args.run, "thresh_calibration.json")
    with open(opath, "w") as f:
        json.dump(out, f, indent=1)
    print(f"best threshold {best['token_thresh']}: val success "
          f"{best['success_rate']:.3f} -> {opath}", flush=True)


if __name__ == "__main__":
    main()
