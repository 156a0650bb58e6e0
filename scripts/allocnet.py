#!/usr/bin/env python
"""allocnet_tpu command line — the headless application layer standing in for
the reference's ROS node (learning_planning.cpp:37-323): plan on a map,
generate datasets, train, evaluate, export.

Usage:
  python scripts/allocnet.py datagen --out data/dataset.h5 --n 512
  python scripts/allocnet.py train --dataset data/dataset.h5 --workdir runs/e0
  python scripts/allocnet.py eval --dataset data/dataset.h5 \
      --checkpoint /root/reference/src/planner/models/seq5_tokenthresh0_35_cpu.pt
  python scripts/allocnet.py plan --pcd map.pcd --start 1 1 1.5 --goal 18 18 2 \
      --checkpoint ... --out artifacts/
  python scripts/allocnet.py export --checkpoint ... --out exported/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _cfg(args):
    from allocnet_tpu.config import AllocNetConfig, QPConfig
    return AllocNetConfig(qp=QPConfig(res=args.res))


def _load_net(args):
    import jax
    import jax.numpy as jnp
    from allocnet_tpu.models import import_torch
    from allocnet_tpu.models.networks import ConvLSTMAllocNet

    seq = import_torch.seq_len_of_checkpoint(args.checkpoint)
    net = ConvLSTMAllocNet(seq_len=seq, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(
        jnp.asarray, import_torch.load_torchscript_lstm(args.checkpoint))
    return net, params


def cmd_datagen(args):
    from allocnet_tpu.train import datagen
    points = None
    if args.pcd:
        from allocnet_tpu.utils import pcd
        points = pcd.read_pcd(args.pcd)
    sc = datagen.generate(_cfg(args), args.n, out_path=args.out,
                          points=points, seed=args.seed)
    print(json.dumps({"samples": int(sc.state.shape[0]), "out": args.out}))


def cmd_train(args):
    from allocnet_tpu.config import TrainConfig
    import dataclasses
    from allocnet_tpu.models.networks import ConvLSTMAllocNet
    from allocnet_tpu.train import dataset as ds_lib, trainer as trainer_lib

    cfg = _cfg(args)
    cfg = dataclasses.replace(cfg, train=TrainConfig(
        batch_size=args.batch_size, max_epochs=args.epochs))
    sc = ds_lib.read_h5(args.dataset, cfg.qp)
    loader = ds_lib.Loader(sc, batch_size=cfg.train.batch_size)
    net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                           hidden_size=args.hidden,
                           token_thresh=cfg.model.token_thresh)
    tr = trainer_lib.Trainer(cfg, net, loader, args.workdir)
    tr.train()
    print(json.dumps({"workdir": args.workdir, "steps": int(tr.ts.step)}))


def cmd_eval(args):
    from allocnet_tpu.train import dataset as ds_lib, evaluate
    cfg = _cfg(args)
    net, params = _load_net(args)
    sc = ds_lib.read_h5(args.dataset, cfg.qp)
    rep = evaluate.evaluate(net, params, cfg, sc)
    print(json.dumps(rep._asdict()))


def cmd_plan(args):
    from allocnet_tpu.planner import planner as planner_lib, trajectory
    from allocnet_tpu.train import datagen
    from allocnet_tpu.viz import artifacts

    cfg = _cfg(args)
    if args.pcd:
        from allocnet_tpu.utils import pcd
        points = pcd.read_pcd(args.pcd)
        lo = points.min(axis=0) - 0.5
        hi = points.max(axis=0) + 0.5
    else:
        points = datagen.random_pillar_map(args.seed)
        lo, hi = np.zeros(3), np.array([20.0, 20.0, 4.0])

    net, params = _load_net(args)
    pmap = planner_lib.build_map(points, lo, hi)
    out = planner_lib.plan_many(
        pmap, np.asarray([args.start]), np.asarray([args.goal]),
        net, params, cfg, seed=args.seed, refine_steps=args.refine)
    os.makedirs(args.out, exist_ok=True)
    ok = bool(out.corridor_ok[0]) and bool(np.asarray(out.result.ok)[0])
    reason = out.reasons[0]
    if reason == "ok" and not ok:
        # corridor succeeded; name the downstream failure stage
        # (the reference's taxonomy: bad predicted times vs QP failure,
        # learning_planner.hpp:181-189 / qp_solver.hpp:334-352)
        reason = ("bad_times" if bool(np.asarray(out.result.solved)[0])
                  else "qp_failed")
    report = {"ok": ok, "reason": reason,
              "times": np.asarray(out.result.times)[0].tolist(),
              "obj": float(np.asarray(out.result.obj)[0])}
    if out.corridor_ok[0]:
        _, states = trajectory.sample(out.traj, 100, max_deriv=0)
        pts = np.asarray(states)[0, :, 0, :]
        artifacts.plot_trajectory(out.traj, 0,
                                  os.path.join(args.out, "trajectory.png"))
        report["artifact"] = os.path.join(args.out, "trajectory.png")
    print(json.dumps(report))


def cmd_export(args):
    from allocnet_tpu.models import export as export_lib
    net, params = _load_net(args)
    export_lib.save(args.out, net, params,
                    seq_len=net.seq_len)
    print(json.dumps({"out": args.out}))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--res", type=int, default=20)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("datagen")
    d.add_argument("--out", required=True)
    d.add_argument("--n", type=int, default=256)
    d.add_argument("--pcd", default=None)
    d.add_argument("--seed", type=int, default=0)
    d.set_defaults(fn=cmd_datagen)

    t = sub.add_parser("train")
    t.add_argument("--dataset", required=True)
    t.add_argument("--workdir", required=True)
    t.add_argument("--batch-size", type=int, default=32)
    t.add_argument("--epochs", type=int, default=50)
    t.add_argument("--hidden", type=int, default=256)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval")
    e.add_argument("--dataset", required=True)
    e.add_argument("--checkpoint", required=True)
    e.set_defaults(fn=cmd_eval)

    pl = sub.add_parser("plan")
    pl.add_argument("--pcd", default=None)
    pl.add_argument("--start", type=float, nargs=3, required=True)
    pl.add_argument("--goal", type=float, nargs=3, required=True)
    pl.add_argument("--checkpoint", required=True)
    pl.add_argument("--out", default="artifacts")
    pl.add_argument("--seed", type=int, default=0)
    pl.add_argument("--refine", type=int, default=0, metavar="STEPS",
                    help="MINCO-style time-refinement steps (0 = off): "
                         "redistribute the net's total time across segments "
                         "by gradient descent through the differentiable QP")
    pl.set_defaults(fn=cmd_plan)

    ex = sub.add_parser("export")
    ex.add_argument("--checkpoint", required=True)
    ex.add_argument("--out", required=True)
    ex.set_defaults(fn=cmd_export)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
