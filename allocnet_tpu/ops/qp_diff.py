"""Differentiable batched QP solve (implicit KKT gradients).

TPU-native equivalent of the reference's OsqpLayer (layers.py:35-247), which
re-engages autograd by registering a backward hook that solves the full
(n + m_total)-dimensional KKT Jacobian  J = [[Q, G^T diag(lam), A^T],
[G, diag(Gx-h), 0], [A, 0, 0]]  densely (layers.py:131-147) — ~6300x6300 per
scenario at deployment sizes.

We instead differentiate through the ACTIVE-SET KKT system (OptNet-style):
inactive rows have lam_i = 0 and slack_i < 0, so their contribution to the
reference's J vanishes identically; restricting to the active set is exact
under strict complementarity and shrinks the backward solve to
(n + m_eq + K) ~ 330 — assembled from the same closed-form structured
operators as the forward solve, batched, fixed-shape.

    solve(cfg, scfg, state, hpolys, times, seg) -> (coeffs, sol)

`coeffs` carries gradients w.r.t. (state, hpolys, times); `sol` is the
stop-gradient QPSolution (flags, residuals, objective).  Unsolved scenarios
get zero gradient (the caller routes them to the supervised-time loss branch,
mirroring minsnap_network_conv_lstm.py:380-389).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp


def _active_set(data, scfg, x, lam_flat):
    """Deterministic active-set selection from a solved point (same scoring
    as the polish step)."""
    ax_tree = qp.apply_A(data, x)
    ineq_flat = qp.tree_flat({k: ax_tree[k] for k in qp.INEQ_KEYS}, qp.INEQ_KEYS)
    h_flat = qp.tree_flat(qp.ineq_rhs(data), qp.INEQ_KEYS)
    slack = h_flat - ineq_flat
    scale = jnp.maximum(jnp.max(jnp.abs(lam_flat), axis=1, keepdims=True), 1.0)
    score = lam_flat / scale - jnp.maximum(slack, 0.0)
    _, idx = jax.lax.top_k(score, scfg.max_active)
    active = ((jnp.take_along_axis(lam_flat, idx, axis=1) > 1e-6 * scale)
              & (jnp.take_along_axis(slack, idx, axis=1) < 1e-5))
    return idx, active.astype(x.dtype)


def _residuals_fn(cfg, seg, idx, active, state, hpolys, times, x, nu, lam_act):
    """KKT residual map R(theta, s); differentiable in theta = (state,
    hpolys, times) through the structured assembly ops."""
    data = qp.build_qp(cfg, state, hpolys, times, seg)
    B = x.shape[0]
    Aeq, beq = qp.dense_eq(data)
    G_act, h_act = admm._gather_ineq_rows(data, idx)
    G_act = G_act * active[..., None]
    h_act = h_act * active

    xf = x.reshape(B, -1)
    r1 = (qp.apply_P(data, x).reshape(B, -1)
          + jnp.einsum('bmn,bm->bn', Aeq, nu)
          + jnp.einsum('bkn,bk->bn', G_act, lam_act))
    r2 = jnp.einsum('bmn,bn->bm', Aeq, xf) - beq
    r3 = (jnp.einsum('bkn,bn->bk', G_act, xf) - h_act) * active
    return r1, r2, r3


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _solve_x(cfg: QPConfig, scfg: SolverConfig, state, hpolys, times, seg):
    data = qp.build_qp(cfg, state, hpolys, times, seg)
    sol = admm.solve_qp(data, scfg)
    return sol.x, jax.tree.map(jax.lax.stop_gradient, sol)


def _solve_x_fwd(cfg, scfg, state, hpolys, times, seg):
    data = qp.build_qp(cfg, state, hpolys, times, seg)
    sol = admm.solve_qp(data, scfg)
    lam_flat = qp.tree_flat(sol.lam, qp.INEQ_KEYS)
    idx, active = _active_set(data, scfg, sol.x, lam_flat)
    lam_act = jnp.take_along_axis(lam_flat, idx, axis=1) * active
    res = (state, hpolys, times, seg, sol.x, sol.nu, lam_act, idx, active,
           sol.solved)
    return (sol.x, jax.tree.map(jax.lax.stop_gradient, sol)), res


def _solve_x_bwd(cfg, scfg, res, cots):
    state, hpolys, times, seg, x, nu, lam_act, idx, active, solved = res
    x_bar, _ = cots                     # aux (QPSolution) is stop-gradient
    B = x.shape[0]
    n = cfg.n_var
    dtype = x.dtype

    # zero cotangent for unsolved scenarios: their "solution" is meaningless
    x_bar = x_bar * solved.astype(dtype).reshape(B, 1, 1, 1)

    with jax.default_matmul_precision('float32'):
        data = qp.build_qp(cfg, state, hpolys, times, seg)
        Aeq, _ = qp.dense_eq(data)
        m_eq = Aeq.shape[1]
        G_act, _ = admm._gather_ineq_rows(data, idx)
        G_act = G_act * active[..., None]
        P = admm._dense_P_explicit(data)

        K_act = scfg.max_active
        m = m_eq + K_act
        kdim = n + m
        dmin = 1e-5 if dtype == jnp.float32 else 0.0
        delta = jnp.asarray(max(scfg.polish_delta, dmin), dtype)

        A_full = jnp.concatenate([Aeq, G_act], axis=1)
        Kmat = jnp.zeros((B, kdim, kdim), dtype)
        Kmat = Kmat.at[:, :n, :n].set(P + delta * jnp.eye(n, dtype=dtype))
        Kmat = Kmat.at[:, :n, n:].set(jnp.swapaxes(A_full, 1, 2))
        Kmat = Kmat.at[:, n:, :n].set(A_full)
        # inert rows (inactive padding) need a nonzero diagonal; active rows
        # get -delta regularization like the polish
        Kmat = Kmat.at[:, n:, n:].set(-delta * jnp.eye(m, dtype=dtype))

        rhs = jnp.concatenate(
            [x_bar.reshape(B, n), jnp.zeros((B, m), dtype)], axis=1)
        lu, piv = jax.scipy.linalg.lu_factor(Kmat)
        sol_uvw = jax.scipy.linalg.lu_solve((lu, piv), rhs)
        # one refinement step on the unregularized system
        K0 = Kmat.at[:, :n, :n].add(-delta * jnp.eye(n, dtype=dtype))
        K0 = K0.at[:, n:, n:].add(delta * jnp.eye(m, dtype=dtype))
        r = jnp.einsum('bij,bj->bi', K0, sol_uvw) - rhs
        sol_uvw = sol_uvw - jax.scipy.linalg.lu_solve((lu, piv), r)

        u = sol_uvw[:, :n]
        v = sol_uvw[:, n:n + m_eq]
        w = sol_uvw[:, n + m_eq:] * active

        def lagr(st, hp, tm):
            r1, r2, r3 = _residuals_fn(cfg, seg, idx, active, st, hp, tm,
                                       x, nu, lam_act)
            return (jnp.sum(u * r1) + jnp.sum(v * r2) + jnp.sum(w * r3))

        g_state, g_hpolys, g_times = jax.grad(lagr, argnums=(0, 1, 2))(
            state, hpolys, times)

    return (-g_state, -g_hpolys, -g_times, None)


_solve_x.defvjp(_solve_x_fwd, _solve_x_bwd)


def solve(cfg: QPConfig, scfg: SolverConfig, state, hpolys, times, seg):
    """Differentiable solve: returns (coeffs, sol).

    coeffs (B, S, 3, D) physical coefficients with gradients w.r.t.
    (state, hpolys, times); sol is the stop-gradient QPSolution."""
    x, sol = _solve_x(cfg, scfg, state, hpolys, times, seg)
    data = qp.build_qp(cfg, state, hpolys, times, seg)
    coeffs = qp.unscale_coeffs(data, x)
    # unsolved scenarios carry no gradient at all (neither through the
    # implicit solve nor through the unscaling's time factors)
    mask = sol.solved.reshape((-1,) + (1,) * (coeffs.ndim - 1))
    coeffs = jnp.where(mask, coeffs, jax.lax.stop_gradient(coeffs))
    return coeffs, sol


def objective(cfg: QPConfig, state, hpolys, times, seg, coeffs):
    """Differentiable physical objective 1/2 x^T Q x from physical coeffs
    (used for the normalized QP-cost loss objc, layers.py:149,245)."""
    data = qp.build_qp(cfg, state, hpolys, times, seg)
    x = qp.scale_coeffs(data, coeffs)
    return qp.objective(data, x)
