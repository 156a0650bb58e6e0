"""Phase-level profile of the batched QP solve on the real chip.

Times each stage separately (each jitted + synced):
  build_qp, normal_matrix+inv (x n_chunks), ADMM scan chunks, residuals,
  polish (gather + KKT assemble + LU + refine), full solve end-to-end.
Run: cd /root/repo && python -u - < scripts/profile_solver.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.utils import scenarios


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt * 1e3:9.1f} ms")
    return out, dt


def main():
    cfg = QPConfig()
    scfg = SolverConfig()
    B = 1024
    sc = scenarios.random_scenarios(cfg, B, seed=123, min_seg=1)
    st = jnp.asarray(sc.state, jnp.float32)
    hp = jnp.asarray(sc.hpolys, jnp.float32)
    tm = jnp.asarray(sc.times, jnp.float32)
    sg = jnp.asarray(sc.seg)

    build = jax.jit(lambda: qp.build_qp(cfg, st, hp, tm, sg))
    data, _ = timeit("build_qp", build)

    with jax.default_matmul_precision("float32"):
        nm = jax.jit(lambda d: qp.normal_matrix(
            d, scfg.sigma, jnp.full((B,), scfg.rho * scfg.rho_eq_scale),
            jnp.full((B,), scfg.rho)))
        M, _ = timeit("normal_matrix", nm, data)
        inv = jax.jit(jnp.linalg.inv)
        Minv, _ = timeit("inv(M) batched", inv, M)

        core = jax.jit(lambda d: admm.admm_solve(d, scfg))
        (x, z, y, *_), t_admm = timeit("admm_solve (3x150 + refactors)", core, data)

        beq = qp.tree_flat(qp.eq_rhs(data), qp.EQ_KEYS)
        h_flat = qp.tree_flat(qp.ineq_rhs(data), qp.INEQ_KEYS)
        lam = jnp.maximum(
            qp.tree_flat({k: y[k] for k in qp.INEQ_KEYS}, qp.INEQ_KEYS), 0.0)

        res = jax.jit(lambda d, x, z, y: admm._residuals(
            d, x, z, y, qp.eq_rhs(d), qp.ineq_rhs(d)))
        timeit("residuals (full)", res, data, x, z, y)

        pol = jax.jit(lambda d, x, y, lam: admm.polish(
            d, scfg, x, y, beq, h_flat, lam))
        _, t_pol = timeit("polish (1 round)", pol, data, x, y, lam)

        # polish sub-phases
        deq = jax.jit(qp.dense_eq)
        timeit("  dense_eq", deq, data)

        Aeq, _ = qp.dense_eq(data)
        m_eq = Aeq.shape[1]
        n = cfg.n_var
        K = scfg.max_active
        kdim = n + m_eq + K
        Kmat = jax.random.normal(jax.random.PRNGKey(0), (B, kdim, kdim),
                                 jnp.float32) + kdim * jnp.eye(kdim)
        rhs = jnp.ones((B, kdim), jnp.float32)
        luf = jax.jit(jax.scipy.linalg.lu_factor)
        (lu, piv), t_lu = timeit(f"  lu_factor ({kdim}x{kdim})", luf, Kmat)
        lus = jax.jit(jax.scipy.linalg.lu_solve)
        timeit("  lu_solve", lus, (lu, piv), rhs)

        full = jax.jit(lambda d: admm.solve_qp(d, scfg))
        sol, t_full = timeit("solve_qp end-to-end", full, data, reps=3)
        print(f"solved: {float(np.asarray(sol.solved).mean()):.4f}  "
              f"=> {B / t_full:.0f} solves/s")


main()
