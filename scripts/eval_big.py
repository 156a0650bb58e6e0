"""Held-out evaluation of the big-run checkpoint on NEVER-SEEN maps.

Generates fresh certified scenarios on map seeds disjoint from the training
corpus (data/big used seeds 1000-1199; here 9000+, same 30/70 pillar/varied
mix as gen_dataset.py), loads the latest runs/big checkpoint, and reports the
reference test-script metrics (success rate, stop-token accuracy,
time-vs-reference ratio -- test_minsnap_model_conv_lstm_batch.py:24,149-182).

Writes runs/big/eval_fresh.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from allocnet_tpu.config import (AllocNetConfig, ModelConfig, QPConfig,
                                 SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import datagen, evaluate, trainer as trainer_lib
from allocnet_tpu.train import train_step as ts_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

WORKDIR = "/root/repo/runs/big"

# the training operating point (scripts/train_big.py) with the
# certification-grade solver budget: eval success must measure the NET's
# time quality, not the solver's iteration budget (the scenarios themselves
# were certified at this budget, config.CERTIFY_SOLVER)
cfg = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=SolverConfig(polish_rounds=4, iters_per_chunk=250),
    train=TrainConfig(batch_size=128),
    model=ModelConfig(hidden_size=256),
)

CACHE = "/root/repo/data/eval_fresh.npz"


def fresh_scenarios(n: int, seed0: int = 9000) -> ScenarioBatch:
    # datagen op point, with the front-end PINNED to plain RRT: the cached
    # eval set (data/eval_fresh.npz, committed) was generated before
    # Informed RRT* became the config default; a cache regen must
    # reproduce the same scenario distribution the committed eval JSONs
    # were measured on.
    from allocnet_tpu.config import CorridorConfig
    gen_cfg = AllocNetConfig(corridor=CorridorConfig(use_rrt_star=False))
    parts, mi = [], 0
    got = 0
    while got < n and mi < 40:
        mseed = seed0 + mi
        mi += 1
        plain = (mseed % 100) < 30
        points = (datagen.random_pillar_map(mseed) if plain
                  else datagen.random_obstacle_map(mseed))
        sc = datagen.generate(gen_cfg, min(400, n - got), points=points,
                              seed=mseed)
        parts.append(sc)
        got += sc.state.shape[0]
        print(f"map {mseed}: {sc.state.shape[0]} certified ({got}/{n})",
              flush=True)
    return ScenarioBatch(
        state=np.concatenate([s.state for s in parts]),
        hpolys=np.concatenate([s.hpolys for s in parts]),
        times=np.concatenate([s.times for s in parts]),
        seg=np.concatenate([s.seg for s in parts]))


def main():
    # usage: eval_big.py [n] [--run runs/xyz] [--thresh 0.42]
    workdir, thresh, n = WORKDIR, cfg.model.token_thresh, 2000
    argv = sys.argv[1:]
    while argv:
        a = argv.pop(0)
        if a == "--run":
            workdir = os.path.abspath(argv.pop(0))
        elif a == "--thresh":
            thresh = float(argv.pop(0))
        else:
            n = int(a)
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        sc = ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                           times=z["times"], seg=z["seg"])
    else:
        sc = fresh_scenarios(n)
        np.savez(CACHE, state=sc.state, hpolys=sc.hpolys, times=sc.times,
                 seg=sc.seg)

    import dataclasses
    ecfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, token_thresh=thresh))
    net = ConvLSTMAllocNet(seq_len=ecfg.model.seq_len,
                           hidden_size=ecfg.model.hidden_size,
                           token_thresh=thresh)
    s0 = jnp.asarray(sc.state[:1], jnp.float32)
    h0 = jnp.asarray(sc.hpolys[:1], jnp.float32)
    template = ts_lib.init_state(net, ecfg.train, s0, h0)
    path = trainer_lib.latest_checkpoint(os.path.join(workdir, "checkpoints"))
    assert path, f"no checkpoint under {workdir}"
    ts, epoch = trainer_lib.restore_checkpoint(path, template)
    print(f"restored {path} (epoch {epoch}, step {int(ts.step)})", flush=True)

    rep, ex = evaluate.evaluate(net, ts.params, ecfg, sc, certify=True,
                                extras=True)
    out = dict(rep._asdict(), checkpoint=os.path.basename(path),
               epoch=epoch, fresh_maps=True, seed0=9000,
               token_thresh=thresh)
    with open(os.path.join(workdir, "eval_fresh.json"), "w") as f:
        json.dump(out, f, indent=1)
    # per-scenario outcomes for paired (McNemar) model comparisons
    np.savez(os.path.join(workdir, "eval_fresh_per_scenario.npz"),
             solved=ex["solved"], certified=ex["certified"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
