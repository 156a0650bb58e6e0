"""Batched ADMM+polish solver vs the KKT-certified NumPy oracle.

North-star acceptance (BASELINE.md): trajectories must match the reference's
OSQP solutions within 1e-3.  The oracle below is certified by its own KKT
residual (< 1e-7), so agreement with it implies agreement with any accurate
solver of the same QP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.utils import scenarios
from tests.oracle import qp_oracle


def _solve_batch(order, batch, seed, res=10):
    cfg = QPConfig(order=order, res=res, max_vel=4.0, max_acc=6.0)
    scfg = SolverConfig()
    sc = scenarios.random_scenarios(cfg, batch, seed=seed, min_seg=1)
    data = qp.build_qp(cfg, jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                       jnp.asarray(sc.times), jnp.asarray(sc.seg))
    sol = jax.jit(admm.solve_qp, static_argnums=(1,))(data, scfg)
    return cfg, sc, sol


@pytest.mark.parametrize("order", [3, 4])
def test_solution_matches_oracle(order):
    cfg, sc, sol = _solve_batch(order, batch=6, seed=11)
    coeffs = np.asarray(sol.coeffs)
    for b in range(6):
        ora = qp_oracle.solve_scenario(
            cfg, sc.state[b], sc.hpolys[b], sc.times[b], sc.seg[b])
        assert ora['kkt'] < 1e-7, f"oracle not certified: {ora['kkt']}"
        L = int(sc.seg[b])
        got = coeffs[b, :L]
        diff = np.max(np.abs(got - ora['coeffs']))
        assert diff < 1e-3, f"scenario {b}: coeff diff {diff}"
        obj = float(np.asarray(sol.obj)[b])
        np.testing.assert_allclose(obj, ora['obj'], rtol=1e-3, atol=1e-6)
        assert bool(np.asarray(sol.solved)[b])


@pytest.mark.parametrize("order", [3, 4])
def test_kkt_residuals(order):
    cfg, sc, sol = _solve_batch(order, batch=8, seed=13)
    pri = np.asarray(sol.pri_res)
    dua = np.asarray(sol.dua_res)
    assert np.all(pri < 1e-5), pri
    assert np.all(dua < 1e-5), dua


def test_constraint_satisfaction():
    """Physical-space checks: endpoint states, junction continuity, corridor
    membership and box limits at the sample points."""
    cfg, sc, sol = _solve_batch(4, batch=5, seed=17)
    coeffs = np.asarray(sol.coeffs)
    for b in range(5):
        L = int(sc.seg[b])
        T = sc.times[b]
        c = coeffs[b]
        # endpoints
        for r in range(3):
            row0 = qp_oracle.t_state(cfg.order, 0.0)[r]
            rowT = qp_oracle.t_state(cfg.order, T[L - 1])[r]
            np.testing.assert_allclose(
                c[0] @ row0, sc.state[b, 0, :, r], atol=1e-5)
            np.testing.assert_allclose(
                c[L - 1] @ rowT, sc.state[b, 1, :, r], atol=1e-5)
        # continuity
        for i in range(L - 1):
            for r in range(cfg.order):
                left = c[i] @ qp_oracle.t_state(cfg.order, T[i])[r]
                right = c[i + 1] @ qp_oracle.t_state(cfg.order, 0.0)[r]
                np.testing.assert_allclose(left, right, atol=1e-5)
        # corridor + boxes at samples
        for i in range(L):
            faces = sc.hpolys[b, i]
            nf = int((np.linalg.norm(faces[:, :3], axis=1) > 1e-6).sum())
            for s in range(cfg.res):
                tt = T[i] * s / cfg.res
                basis = qp_oracle.t_state(cfg.order, tt)
                pos = c[i] @ basis[0]
                assert np.all(faces[:nf, :3] @ pos <= faces[:nf, 3] + 1e-5)
                assert np.all(np.abs(c[i] @ basis[1]) <= cfg.max_vel + 1e-5)
                assert np.all(np.abs(c[i] @ basis[2]) <= cfg.max_acc + 1e-5)


def test_padded_segments_inert():
    """Padded segment coefficients must come back exactly zero, and mixing
    padded scenarios in a batch must not change the active solutions."""
    cfg = QPConfig(order=4, res=10)
    scfg = SolverConfig()
    sc = scenarios.random_scenarios(cfg, 4, seed=19, min_seg=2, max_seg=3)
    data = qp.build_qp(cfg, jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                       jnp.asarray(sc.times), jnp.asarray(sc.seg))
    sol = jax.jit(admm.solve_qp, static_argnums=(1,))(data, scfg)
    coeffs = np.asarray(sol.coeffs)
    for b in range(4):
        assert np.all(coeffs[b, int(sc.seg[b]):] == 0.0)


def test_batched_equals_single():
    """SURVEY section 4: batched-vs-single equivalence — solving scenarios
    together must give identical results to solving them alone (no cross-
    scenario leakage through the masked batch)."""
    cfg = QPConfig(order=4, res=10)
    scfg = SolverConfig(n_chunks=2, iters_per_chunk=75)
    sc = scenarios.random_scenarios(cfg, 4, seed=23, min_seg=1)
    # one jitted program per batch size: the B=1 compile is reused 4x
    solve = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
        qp.build_qp(cfg, st, hp, tm, sg), scfg))
    batched = solve(jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                    jnp.asarray(sc.times), jnp.asarray(sc.seg))
    for b in range(4):
        single = solve(jnp.asarray(sc.state[b:b + 1]),
                       jnp.asarray(sc.hpolys[b:b + 1]),
                       jnp.asarray(sc.times[b:b + 1]),
                       jnp.asarray(sc.seg[b:b + 1]))
        np.testing.assert_allclose(np.asarray(single.coeffs)[0],
                                   np.asarray(batched.coeffs)[b],
                                   rtol=1e-10, atol=1e-12)
        assert bool(single.solved[0]) == bool(np.asarray(batched.solved)[b])
