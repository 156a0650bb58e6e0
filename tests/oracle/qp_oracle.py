"""NumPy float64 oracle for the corridor-constrained min-jerk/snap QP.

Independent re-implementation of the reference math in original (physical
time) variables, used as golden truth for the TPU build:

  * dense assembly follows qp_solver.hpp:119-296 / min_traj_opt.py:377-697
    (same matrices, same row ordering);
  * the solve is a long-run dense ADMM + exact active-set refinement; every
    oracle solution is certified by its KKT residual before use, so the
    goldens do not depend on any particular solver's quirks.
"""

from __future__ import annotations

import numpy as np


def t_state(order: int, t: float) -> np.ndarray:
    """(order, 2*order) rows: value/derivative basis rows at time t,
    highest-degree-first (reference get_t_state, qp_solver.hpp:90-116)."""
    D = 2 * order
    rows = np.zeros((order, D))
    for r in range(order):
        for k in range(D):
            deg = D - 1 - k
            if deg >= r:
                f = 1.0
                for i in range(r):
                    f *= deg - i
                rows[r, k] = f * t ** (deg - r)
    return rows


def cost_block(order: int, t: float) -> np.ndarray:
    """order x order Hessian block: Gram matrix of the order-th derivative of
    the top `order` monomials over [0, t] (matches the closed-form CostQ,
    qp_solver.hpp:197-235)."""
    D = 2 * order
    Q = np.zeros((order, order))
    for a in range(order):
        for b_ in range(order):
            da, db = D - 1 - a, D - 1 - b_
            fa = fb = 1.0
            for i in range(order):
                fa *= da - i
                fb *= db - i
            p = da + db - 2 * order
            Q[a, b_] = fa * fb * t ** (p + 1) / (p + 1)
    if order == 4:
        # reproduce the reference's hardcoded (incorrect) m_34 = 1400 t^2
        # (qp_solver.hpp:213, min_traj_opt.py:493); true value is 1440 t^2.
        Q[2, 3] = Q[3, 2] = 1400.0 * t ** 2
    return Q


def assemble(order, res, iniPVA, finPVA, hpolys, times, vmax, amax):
    """Dense (Q, A, b, G, h) in the reference's exact layout.

    iniPVA/finPVA: (3, 3) rows=axis, cols=(p,v,a);
    hpolys: list of (F_i, 4) arrays (a.x <= b rows); times: (seg,).
    """
    dim, state_dim = 3, 3
    D = 2 * order
    seg = len(hpolys)
    n = seg * dim * D
    zero_A = t_state(order, 0.0)

    # equalities (qp_solver.hpp:139-177)
    n_eq = (2 * state_dim + order * (seg - 1)) * dim
    A = np.zeros((n_eq, n))
    b = np.zeros(n_eq)
    row = 0
    s_num = (seg - 1) * dim * D
    for j in range(dim):
        idx = j * D
        A[row:row + state_dim, idx:idx + D] = zero_A[:state_dim]
        b[row:row + state_dim] = iniPVA[j]
        row += state_dim
        A[row:row + state_dim, s_num + idx:s_num + idx + D] = \
            t_state(order, times[seg - 1])[:state_dim]
        b[row:row + state_dim] = finPVA[j]
        row += state_dim
    for i in range(seg - 1):
        idx = i * dim * D
        for j in range(dim):
            col = idx + j * D
            nxt = col + dim * D
            A[row:row + order, col:col + D] = t_state(order, times[i])
            A[row:row + order, nxt:nxt + D] = -t_state(order, 0.0)
            row += order

    # objective (qp_solver.hpp:179-242)
    Q = np.zeros((n, n))
    for i in range(seg):
        cq = cost_block(order, times[i])
        for j in range(dim):
            col = i * dim * D + j * D
            Q[col:col + order, col:col + order] = cq

    # inequalities (qp_solver.hpp:244-296); row order: per (seg, sample):
    # corridor rows, then per axis [+v, +a, -v, -a]
    n_corr = res * sum(h.shape[0] for h in hpolys)
    n_box = res * 4 * dim * seg
    G = np.zeros((n_corr + n_box, n))
    h = np.zeros(n_corr + n_box)
    row = 0
    for i in range(seg):
        step = times[i] / res
        idx = i * dim * D
        F_i = hpolys[i].shape[0]
        for s in range(res):
            tt = step * s
            basis = zero_A if s == 0 else t_state(order, tt)
            poly_row = row
            h[poly_row:poly_row + F_i] = hpolys[i][:, 3]
            row += F_i
            for k in range(dim):
                col = idx + k * D
                G[poly_row:poly_row + F_i, col:col + D] = \
                    np.outer(hpolys[i][:, k], basis[0])
                G[row:row + 2, col:col + D] = basis[1:3]
                h[row:row + 2] = [vmax, amax]
                row += 2
                G[row:row + 2, col:col + D] = -basis[1:3]
                h[row:row + 2] = [vmax, amax]
                row += 2
    return Q, A, b, G, h


def _ruiz(Q, Afull, iters=25):
    """Ruiz equilibration of the KKT matrix [[Q, A^T], [A, 0]] (as OSQP does);
    returns variable scales d and constraint-row scales e."""
    n, m = Q.shape[0], Afull.shape[0]
    d, e = np.ones(n), np.ones(m)
    for _ in range(iters):
        Qs = d[:, None] * Q * d[None, :]
        As = e[:, None] * Afull * d[None, :]
        cn = np.sqrt(np.maximum(np.abs(Qs).max(axis=0), np.abs(As).max(axis=0)))
        rn = np.sqrt(np.abs(As).max(axis=1))
        d /= np.maximum(cn, 1e-10)
        e /= np.maximum(rn, 1e-10)
    return d, e


def solve_dense(Q, A, b, G, h, iters=40000, rho=0.1, rho_eq_scale=1e3,
                sigma=1e-6, alpha=1.6, refine=True):
    """Dense f64 ADMM (OSQP algorithm, with Ruiz equilibration) + exact
    active-set refinement on the ORIGINAL matrices.

    Returns (x, nu, lam, info) with info['kkt'] the final KKT residual
    measured on the original (unscaled) problem — the certificate is
    independent of any scaling choices.
    """
    n = Q.shape[0]
    m_eq, m_in = A.shape[0], G.shape[0]
    Afull = np.vstack([A, G])

    d, e = _ruiz(Q, Afull)
    Qs = d[:, None] * Q * d[None, :]
    As = e[:, None] * Afull * d[None, :]
    los = e * np.concatenate([b, -np.inf * np.ones(m_in)])
    his = e * np.concatenate([b, h])

    rho_vec = np.concatenate([rho * rho_eq_scale * np.ones(m_eq),
                              rho * np.ones(m_in)])

    x = np.zeros(n)
    z = np.clip(As @ x, los, his)
    y = np.zeros(m_eq + m_in)

    M = Qs + sigma * np.eye(n) + As.T @ (rho_vec[:, None] * As)
    Minv = np.linalg.inv(M)
    for it in range(iters):
        rhs = sigma * x + As.T @ (rho_vec * z - y)
        xt = Minv @ rhs
        zt = As @ xt
        x = alpha * xt + (1 - alpha) * x
        v = alpha * zt + (1 - alpha) * z + y / rho_vec
        z_new = np.clip(v, los, his)
        # v already contains y/rho, so y_new = rho * (v - z_new)
        y = rho_vec * (v - z_new)
        z = z_new
        if it % 1000 == 999:
            pri = np.max(np.abs(As @ x - z))
            dua = np.max(np.abs(Qs @ x + As.T @ y))
            # keep this strict: exiting at 1e-9 was measured to change the
            # refinement active set enough to push one golden case's KKT
            # certificate from <1e-7 to 1.1e-7, and saves no wall time.
            if pri < 1e-11 and dua < 1e-11:
                break

    # unscale
    x = d * x
    y = e * y
    nu, lam = y[:m_eq], np.maximum(y[m_eq:], 0.0)

    if refine:
        act = (lam > 1e-7 * max(1.0, lam.max())) | (h - G @ x < 1e-7)
        Ga = G[act]
        K = np.block([
            [Q, A.T, Ga.T],
            [A, np.zeros((m_eq, m_eq + Ga.shape[0]))],
            [Ga, np.zeros((Ga.shape[0], m_eq + Ga.shape[0]))],
        ])
        rhs = np.concatenate([np.zeros(n), b, h[act]])
        sol, *_ = np.linalg.lstsq(K, rhs, rcond=None)
        x_r = sol[:n]
        nu_r = sol[n:n + m_eq]
        lam_r = np.zeros(m_in)
        lam_r[act] = sol[n + m_eq:]
        ok = (
            np.all(G @ x_r <= h + 1e-7)
            and np.all(lam_r >= -1e-7)
            and np.max(np.abs(A @ x_r - b)) < 1e-8
        )
        if ok:
            x, nu, lam = x_r, nu_r, np.maximum(lam_r, 0.0)

    kkt = max(
        np.max(np.abs(Q @ x + A.T @ nu + G.T @ lam)),
        np.max(np.abs(A @ x - b)) if m_eq else 0.0,
        np.max(np.maximum(G @ x - h, 0.0)) if m_in else 0.0,
    )
    info = {'kkt': kkt, 'obj': 0.5 * x @ Q @ x}
    return x, nu, lam, info


def solve_scenario(cfg, state, hpolys_padded, times, seg, **kw):
    """Convenience: padded scenario arrays -> oracle solution dict."""
    hlist = []
    for i in range(int(seg)):
        rows = hpolys_padded[i]
        keep = np.linalg.norm(rows[:, :3], axis=1) > 1e-6
        hlist.append(rows[keep])
    iniPVA, finPVA = state[0], state[1]
    Q, A, b, G, h = assemble(cfg.order, cfg.res, iniPVA, finPVA, hlist,
                             times[:int(seg)], cfg.max_vel, cfg.max_acc)
    x, nu, lam, info = solve_dense(Q, A, b, G, h, **kw)
    D = 2 * cfg.order
    coeffs = x.reshape(int(seg), 3, D)
    return {'x': x, 'coeffs': coeffs, 'nu': nu, 'lam': lam,
            'Q': Q, 'A': A, 'b': b, 'G': G, 'h': h, **info}
