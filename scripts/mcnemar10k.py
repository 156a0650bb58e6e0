"""Grow the paired model comparison to n~10k scenarios (VERDICT r4 #5).

The n=2000 McNemar left the QP-gradient thesis unresolved (finetune +0.6 pp
p=0.37, distilled +1.15 pp p=0.098).  This script extends the never-seen
eval set with ~8000 fresh certified scenarios from DISJOINT map seeds
(12000+; training used 1000-1199, the committed 2000-cache used 9000+),
caches the union at data/eval_fresh10k.npz, and re-runs the exact paired
evaluation of scripts/mcnemar_eval.py on it.

Writes runs/mcnemar/results_10k.json (+ per-scenario outcome vectors).

Usage: python scripts/mcnemar10k.py [target_n]
"""

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from allocnet_tpu.utils.scenarios import ScenarioBatch

CACHE2K = "/root/repo/data/eval_fresh.npz"
CACHE10K = "/root/repo/data/eval_fresh10k.npz"
OUT = "/root/repo/runs/mcnemar"


def _load(path):
    z = np.load(path)
    return ScenarioBatch(state=z["state"], hpolys=z["hpolys"],
                         times=z["times"], seg=z["seg"])


def build_cache(target_n: int) -> ScenarioBatch:
    if os.path.exists(CACHE10K):
        sc = _load(CACHE10K)
        if sc.state.shape[0] >= target_n * 0.95:
            return sc
    spec = importlib.util.spec_from_file_location(
        "eval_big", "/root/repo/scripts/eval_big.py")
    eval_big = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eval_big)

    base = _load(CACHE2K)
    need = target_n - base.state.shape[0]
    fresh = eval_big.fresh_scenarios(need, seed0=12000)
    sc = ScenarioBatch(
        state=np.concatenate([base.state, fresh.state]),
        hpolys=np.concatenate([base.hpolys, fresh.hpolys]),
        times=np.concatenate([base.times, fresh.times]),
        seg=np.concatenate([base.seg, fresh.seg]))
    np.savez(CACHE10K, state=sc.state, hpolys=sc.hpolys, times=sc.times,
             seg=sc.seg)
    print(f"cached {sc.state.shape[0]} scenarios -> {CACHE10K}", flush=True)
    return sc


def main():
    target_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    sc = build_cache(target_n)

    spec = importlib.util.spec_from_file_location(
        "mcnemar_eval", "/root/repo/scripts/mcnemar_eval.py")
    me = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(me)

    os.makedirs(OUT, exist_ok=True)
    reps, exs = {}, {}
    for arm in me.ARMS:
        reps[arm], exs[arm] = me.eval_arm(arm, sc)
    np.savez(os.path.join(OUT, "per_scenario_10k.npz"),
             **{f"{a}_{k}": exs[a][k] for a in me.ARMS
                for k in ("solved", "certified")})
    out = {
        "n": int(sc.state.shape[0]),
        "cache": ("data/eval_fresh10k.npz = committed 2000 (seeds 9000+) "
                  "+ fresh certified scenarios (seeds 12000+)"),
        "arms": {a: dict(reps[a]._asdict(),
                         token_thresh=me.calibrated_thresh(a))
                 for a in me.ARMS},
        "mcnemar_solved": {f"{x}_vs_{y}": me.mcnemar(exs[x]["solved"],
                                                     exs[y]["solved"])
                           for x, y in me.PAIRS},
        "mcnemar_certified": {
            f"{x}_vs_{y}": me.mcnemar(exs[x]["certified"],
                                      exs[y]["certified"])
            for x, y in me.PAIRS},
    }
    with open(os.path.join(OUT, "results_10k.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "arms"},
                     indent=1))


if __name__ == "__main__":
    main()
