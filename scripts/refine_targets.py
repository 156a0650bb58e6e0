"""Self-distillation stage 1: refine the corpus's supervision time targets.

The certified corpora store the time allocation the datagen heuristic found
feasible — feasible, but not cost-optimal.  This script runs MINCO-style
refinement (planner/refine.py, fixed-total mode) over every sample and
rewrites the `times` targets with the lower-snap-cost allocation at the SAME
total duration; unsolved/unimproved samples pass through untouched (the
refinement is monotone by construction).  Training on the refined targets
(scripts/train_big4.py) then distills the implicit-gradient improvement
into the network — the reference cannot do this (its time targets are
whatever IRIS-era heuristics produced, and its QP gradients exist only
inside the training loss).

Restartable: per-chunk results are cached under data/refined_parts/ and the
script skips chunks whose cache exists.

Run: python scripts/refine_targets.py [--in data/big100k_combined.npz]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig, CERTIFY_SOLVER, QPConfig
from allocnet_tpu.planner import refine

IN = "data/big100k_combined.npz"
OUT = "data/big100k_refined.npz"
PARTS = "data/refined_parts"
CHUNK = 512
STEPS = 6

cfg = AllocNetConfig(qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
                     solver=CERTIFY_SOLVER)


def _check_part(zz, c, chunk, steps, n, path):
    """Validate a cached chunk against the current run's chunking; legacy
    parts without metadata are rejected too (they predate the refine.py
    baseline fix and may carry floored-start targets)."""
    want = {"start": c * chunk, "stop": min((c + 1) * chunk, n),
            "steps": steps, "n_total": n}
    for k, v in want.items():
        if k not in zz.files or int(zz[k]) != v:
            raise SystemExit(
                f"stale/incompatible cache {path}: expected {k}={v}, "
                f"got {zz[k] if k in zz.files else 'missing'} — delete "
                f"{PARTS} or rerun with the original --chunk/--steps")


def main():
    global PARTS
    src, out, chunk, steps = IN, OUT, CHUNK, STEPS
    argv = sys.argv[1:]
    while argv:
        a = argv.pop(0)
        if a == "--in":
            src = argv.pop(0)
        elif a == "--out":
            out = argv.pop(0)
            PARTS = out + ".parts"
        elif a == "--chunk":
            chunk = int(argv.pop(0))
        elif a == "--steps":
            steps = int(argv.pop(0))
    if os.path.exists(out):
        print(f"{out} exists; nothing to do")
        return
    z = np.load(src)
    state, hpolys, times, seg = (z["state"].astype(np.float32),
                                 z["hpolys"].astype(np.float32),
                                 z["times"].astype(np.float32), z["seg"])
    n = state.shape[0]
    S = times.shape[1]
    os.makedirs(PARTS, exist_ok=True)
    n_chunks = (n + chunk - 1) // chunk
    improved = 0
    for c in range(n_chunks):
        part = os.path.join(PARTS, f"chunk_{c:05d}.npz")
        if os.path.exists(part):
            zz = np.load(part)
            _check_part(zz, c, chunk, steps, n, part)
            improved += int(zz["improved"].sum())
            continue
        sl = slice(c * chunk, min((c + 1) * chunk, n))
        # pad the tail chunk to the compiled batch size
        idx = np.arange(sl.start, sl.stop)
        pad = chunk - len(idx)
        ip = np.concatenate([idx, np.full(pad, idx[-1])]) if pad else idx
        res = refine.refine_times(
            cfg.qp, cfg.solver,
            jnp.asarray(state[ip]), jnp.asarray(hpolys[ip]),
            jnp.asarray(times[ip]), jnp.asarray(seg[ip]), steps=steps)
        t_ref = np.asarray(res.times)[:len(idx)]
        imp = np.asarray(res.improved)[:len(idx)]
        obj0 = np.asarray(res.obj0)[:len(idx)]
        obj1 = np.asarray(res.obj)[:len(idx)]
        ok = obj0 < 1e29
        rel = np.where(ok, (obj0 - obj1) / np.maximum(obj0, 1e-9), 0.0)
        # cache keyed by content, not just filename: a resume with a
        # different --chunk/--steps/source must not silently misassemble
        np.savez(part, times=t_ref, improved=imp, rel=rel,
                 start=sl.start, stop=sl.stop, steps=steps, n_total=n)
        improved += int(imp.sum())
        if c % 10 == 0:
            print(json.dumps({"chunk": c, "of": n_chunks,
                              "improved": improved}), flush=True)

    # assemble
    t_out = np.array(times)
    imp_all = np.zeros(n, bool)
    rel_all = np.zeros(n)
    for c in range(n_chunks):
        part = os.path.join(PARTS, f"chunk_{c:05d}.npz")
        zz = np.load(part)
        _check_part(zz, c, chunk, steps, n, part)
        sl = slice(c * chunk, min((c + 1) * chunk, n))
        k = sl.stop - sl.start
        mask = np.arange(S)[None] < seg[sl][:, None]
        # rewrite only strictly-improved samples (refine_times already passes
        # unimproved ones through, this makes the contract explicit); keep
        # original padding values
        imp = zz["improved"][:k]
        t_out[sl] = np.where(mask & imp[:, None], zz["times"][:k], times[sl])
        imp_all[sl] = imp
        rel_all[sl] = zz["rel"][:k]
    np.savez(out, state=state, hpolys=hpolys, times=t_out, seg=seg)
    stats = {"n": int(n), "steps": steps,
             "improved_frac": float(imp_all.mean()),
             "rel_obj_reduction_mean": float(rel_all.mean()),
             "rel_obj_reduction_median": float(np.median(rel_all))}
    with open(out.replace(".npz", "") + "_stats.json", "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
