"""Experiment: which ADMM matmuls tolerate bf16 MXU passes?

Answers the precision question for the tiled Pallas kernel: the constraint
applications (apply_A / apply_AT) are O(1)-conditioned row operations, the
normal-matrix solve is cond~1e4.  Test A/B/C on the real bench batch:
  A: everything float32 (baseline)
  B: apply_A/apply_AT in default (bf16-pass) precision, x-solve f32
  C: everything default precision
Run: cd /root/repo && python -u - < scripts/exp_bf16.py
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


def patched_admm_solve(data, scfg, x0=None, a_prec="float32"):
    cfg = data.cfg
    dtype = data.times.dtype
    B = data.times.shape[0]
    n = cfg.n_var
    beq = qp.eq_rhs(data)
    h = qp.ineq_rhs(data)
    x = jnp.zeros((B, cfg.max_seg, 3, cfg.D), dtype) if x0 is None else x0
    z = admm._project(qp.apply_A(data, x), beq, h)
    y = admm.tmap(jnp.zeros_like, z)
    rho_i = jnp.full((B,), scfg.rho, dtype)
    rho_e = rho_i * scfg.rho_eq_scale
    sigma = jnp.asarray(scfg.sigma, dtype)
    alpha = jnp.asarray(scfg.alpha, dtype)

    def one_iter(carry, _, M, Minv):
        x, z, y = carry
        rho = admm._rho_tree(y, rho_e_cur, rho_i_cur)
        rhs_tree = admm.tmap(lambda zz, yy, rr: rr * zz - yy, z, y, rho)
        with jax.default_matmul_precision(a_prec):
            at = qp.apply_AT(data, rhs_tree)
        rhs = (sigma * x + at).reshape(B, n)
        xt = jnp.einsum('bnm,bm->bn', Minv, rhs)
        resid = rhs - jnp.einsum('bnm,bm->bn', M, xt)
        xt = xt + jnp.einsum('bnm,bm->bn', Minv, resid)
        xt = jnp.clip(xt, -1e6, 1e6).reshape(x.shape)
        with jax.default_matmul_precision(a_prec):
            zt = qp.apply_A(data, xt)
        x_new = alpha * xt + (1.0 - alpha) * x
        v = admm.tmap(lambda zz, zt_, yy, rr: alpha * zt_ + (1.0 - alpha) * zz
                      + yy / rr, z, zt, y, rho)
        z_new = admm._project(v, beq, h)
        y_new = admm.tmap(lambda vv, zz, rr: jnp.clip((vv - zz) * rr, -1e6, 1e6),
                          v, z_new, rho)
        return (x_new, z_new, y_new), None

    for _ in range(scfg.n_chunks):
        rho_e_cur, rho_i_cur = rho_e, rho_i
        M = qp.normal_matrix(data, sigma, rho_e_cur, rho_i_cur)
        Minv = admm.spd_inverse(M)
        (x, z, y), _ = jax.lax.scan(
            lambda c, s: one_iter(c, s, M, Minv), (x, z, y), None,
            length=scfg.iters_per_chunk)
        pri, pri_rel, dua, dua_rel = admm._residuals(data, x, z, y, beq, h)
        ratio = jnp.sqrt((pri / jnp.maximum(pri_rel, 1e-12))
                         / jnp.maximum(dua / jnp.maximum(dua_rel, 1e-12), 1e-12))
        factor = jnp.clip(ratio, 0.5, 5.0)
        rho_i = jnp.clip(rho_i * factor, 0.25 * scfg.rho, 100.0)
        rho_e = rho_i * scfg.rho_eq_scale
    pri, _, dua, _ = admm._residuals(data, x, z, y, beq, h)
    return x, z, y, rho_e, rho_i, pri, dua


def main():
    cfg = QPConfig()
    B = 1024
    sc = scenarios.random_scenarios(cfg, B, seed=123, min_seg=1)
    args = [jnp.asarray(sc.state, jnp.float32),
            jnp.asarray(sc.hpolys, jnp.float32),
            jnp.asarray(sc.times, jnp.float32), jnp.asarray(sc.seg)]

    import functools
    variants = {
        "A f32 all": ("float32", "float32"),
        "B bf16 applyA": ("float32", "bfloat16"),
        "C bf16 all": ("bfloat16", "bfloat16"),
    }
    for name, (outer, a_prec) in variants.items():
        admm.admm_solve = functools.partial(patched_admm_solve, a_prec=a_prec)

        def impl(st, hp, tm, sg):
            data = qp.build_qp(cfg, st, hp, tm, sg)
            with jax.default_matmul_precision(outer):
                return admm._solve_qp_impl(data, SolverConfig(), None)
        solve = jax.jit(impl)
        sol = solve(*args)
        float(np.asarray(sol.obj).sum())
        t0 = time.time()
        for _ in range(3):
            sol = solve(*args)
            float(np.asarray(sol.obj).sum())
        dt = (time.time() - t0) / 3
        solved = np.asarray(sol.solved)
        print(f"{name:16s} {dt*1e3:7.1f} ms {B/dt:7.0f}/s  "
              f"solved={solved.mean():.4f}", flush=True)


main()
