"""End-to-end config sweep: attribute solve_qp cost by toggling phases.

Run: cd /root/repo && python -u - < scripts/sweep_solver.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.utils import scenarios


def run(cfg, scfg, args, reps=3):
    solve = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
        qp.build_qp(cfg, st, hp, tm, sg), scfg))
    sol = solve(*args)
    float(np.asarray(sol.obj).sum())
    t0 = time.time()
    for _ in range(reps):
        sol = solve(*args)
        float(np.asarray(sol.obj).sum())
    dt = (time.time() - t0) / reps
    solved = float(np.asarray(sol.solved).mean())
    pri = float(np.asarray(sol.pri_res)[np.asarray(sol.solved)].max()) \
        if solved > 0 else float("nan")
    return dt, solved, pri


def main():
    cfg = QPConfig()
    B = 1024
    sc = scenarios.random_scenarios(cfg, B, seed=123, min_seg=1)
    args = [jnp.asarray(sc.state, jnp.float32),
            jnp.asarray(sc.hpolys, jnp.float32),
            jnp.asarray(sc.times, jnp.float32), jnp.asarray(sc.seg)]

    variants = {
        "default (3x150, polish)": SolverConfig(),
        "no polish": SolverConfig(polish=False),
        "2x150 polish": SolverConfig(n_chunks=2),
        "2x100 polish": SolverConfig(n_chunks=2, iters_per_chunk=100),
        "3x75 polish": SolverConfig(iters_per_chunk=75),
        "2x75 polish": SolverConfig(n_chunks=2, iters_per_chunk=75),
        "1x150 polish": SolverConfig(n_chunks=1),
    }
    for name, scfg in variants.items():
        dt, solved, pri = run(cfg, scfg, args)
        print(f"{name:28s} {dt*1e3:7.1f} ms  {B/dt:7.0f}/s  "
              f"solved={solved:.4f} max_pri={pri:.2e}")


def compare_polish():
    """LU vs LDL polish on the same real corridor batch."""
    import dataclasses
    cfg = QPConfig()
    B = 1024
    sc = scenarios.random_scenarios(cfg, B, seed=123, min_seg=1)
    args = [jnp.asarray(sc.state, jnp.float32),
            jnp.asarray(sc.hpolys, jnp.float32),
            jnp.asarray(sc.times, jnp.float32), jnp.asarray(sc.seg)]
    sols = {}
    for method in ("lu", "ldl"):
        scfg = SolverConfig(polish_method=method)
        solve = jax.jit(lambda st, hp, tm, sg, s=scfg: admm.solve_qp(
            qp.build_qp(cfg, st, hp, tm, sg), s))
        sol = solve(*args)
        float(np.asarray(sol.obj).sum())
        t0 = time.time()
        for _ in range(3):
            sol = solve(*args)
            float(np.asarray(sol.obj).sum())
        dt = (time.time() - t0) / 3
        solved = np.asarray(sol.solved)
        print(f"{method}: {dt*1e3:7.1f} ms  {B/dt:6.0f}/s  "
              f"solved={solved.mean():.4f}  polished={np.asarray(sol.polished).mean():.4f}")
        sols[method] = sol
    both = np.asarray(sols['lu'].solved) & np.asarray(sols['ldl'].solved)
    dc = np.abs(np.asarray(sols['lu'].coeffs) - np.asarray(sols['ldl'].coeffs))
    print(f"coeff parity on both-solved: max={dc[both].max():.2e} "
          f"p99={np.percentile(dc[both], 99):.2e}")


compare_polish() if __import__("os").environ.get("SWEEP_MODE") == "polish" else main()
