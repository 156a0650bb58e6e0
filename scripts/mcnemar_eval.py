"""Paired (McNemar) comparison of the trained arms on the frozen eval set.

VERDICT r3 next-step #3: the "QP gradients beat supervision" margin
(finetune 89.3% vs supervised 88.6% at n=2000) is inside the +-1.4 pp
binomial CI.  A paired test on the SAME 2000 scenarios is far more
powerful than comparing two independent rates: discordant pairs only.

Arms (each at its own calibrated stop-token threshold, runs/*/calibration
.json), all evaluated on the committed never-seen-map cache
(data/eval_fresh.npz, map seeds 9000+):

  big3      supervised baseline      (reference training recipe)
  finetune  big3 + QP-gradient finetune (layers.py:35-247 thesis)
  big4      self-distilled flagship

For each pair we report discordant counts (b = first solves where second
fails, c = reverse), the exact two-sided binomial McNemar p-value, and the
paired success delta.  Writes runs/mcnemar/results.json + per-arm
per-scenario outcome vectors (.npz) so the numbers are reproducible.

Usage: python scripts/mcnemar_eval.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("MCNEMAR_CPU"):   # keep the chip free for latency runs
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from scipy import stats

from allocnet_tpu.config import (AllocNetConfig, ModelConfig, QPConfig,
                                 SolverConfig, TrainConfig)
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.train import evaluate, trainer as trainer_lib
from allocnet_tpu.train import train_step as ts_lib
from allocnet_tpu.utils.scenarios import ScenarioBatch

OUT = "/root/repo/runs/mcnemar"
CACHE = "/root/repo/data/eval_fresh.npz"

# evaluation operating point: training shapes + certification-grade solver
# budget (same as scripts/eval_big.py — the committed eval JSONs' setting)
BASE = AllocNetConfig(
    qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
    solver=SolverConfig(polish_rounds=4, iters_per_chunk=250),
    train=TrainConfig(batch_size=128),
    model=ModelConfig(hidden_size=256),
)

ARMS = ("big3", "finetune", "big4")
PAIRS = (("finetune", "big3"),   # QP-gradient finetune vs supervised
         ("big4", "big3"),       # distilled flagship vs supervised
         ("big4", "finetune"))


def calibrated_thresh(run: str) -> float:
    with open(f"/root/repo/runs/{run}/calibration.json") as f:
        return float(json.load(f)["best_thresh"])


def eval_arm(run: str, sc: ScenarioBatch):
    import dataclasses
    thresh = calibrated_thresh(run)
    cfg = dataclasses.replace(
        BASE, model=dataclasses.replace(BASE.model, token_thresh=thresh))
    net = ConvLSTMAllocNet(seq_len=cfg.model.seq_len,
                           hidden_size=cfg.model.hidden_size,
                           token_thresh=thresh)
    s0 = jnp.asarray(sc.state[:1], jnp.float32)
    h0 = jnp.asarray(sc.hpolys[:1], jnp.float32)
    template = ts_lib.init_state(net, cfg.train, s0, h0)
    path = trainer_lib.latest_checkpoint(
        f"/root/repo/runs/{run}/checkpoints")
    assert path, f"no checkpoint for {run}"
    ts, _ = trainer_lib.restore_checkpoint(path, template)
    rep, ex = evaluate.evaluate(net, ts.params, cfg, sc, certify=True,
                                extras=True)
    print(f"{run}: thresh={thresh} success={rep.success_rate:.4f} "
          f"certified={rep.certified_frac:.4f} ({os.path.basename(path)})",
          flush=True)
    return rep, ex


def mcnemar(a: np.ndarray, b: np.ndarray) -> dict:
    """Exact two-sided McNemar on paired boolean outcomes."""
    disc_a = int(np.sum(a & ~b))       # a solves, b fails
    disc_b = int(np.sum(~a & b))
    n = disc_a + disc_b
    p = (min(1.0, 2.0 * stats.binom.cdf(min(disc_a, disc_b), n, 0.5))
         if n else 1.0)
    return {"b_only_first": disc_a, "c_only_second": disc_b,
            "p_two_sided": round(float(p), 5),
            "delta": round(float(a.mean() - b.mean()), 5)}


def main():
    os.makedirs(OUT, exist_ok=True)
    z = np.load(CACHE)
    sc = ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                       times=z["times"], seg=z["seg"])
    reps, exs = {}, {}
    for arm in ARMS:
        reps[arm], exs[arm] = eval_arm(arm, sc)
    np.savez(os.path.join(OUT, "per_scenario.npz"),
             **{f"{a}_{k}": exs[a][k] for a in ARMS
                for k in ("solved", "certified")})
    out = {
        "n": int(sc.state.shape[0]),
        "cache": "data/eval_fresh.npz (map seeds 9000+, never seen)",
        "arms": {a: dict(reps[a]._asdict(),
                         token_thresh=calibrated_thresh(a)) for a in ARMS},
        "mcnemar_solved": {f"{x}_vs_{y}": mcnemar(exs[x]["solved"],
                                                  exs[y]["solved"])
                           for x, y in PAIRS},
        "mcnemar_certified": {f"{x}_vs_{y}": mcnemar(exs[x]["certified"],
                                                     exs[y]["certified"])
                              for x, y in PAIRS},
    }
    with open(os.path.join(OUT, "results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "arms"}, indent=1))


if __name__ == "__main__":
    main()
