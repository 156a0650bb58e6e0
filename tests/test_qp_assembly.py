"""Structured operator parity vs the dense NumPy oracle.

Verifies that the tau-scaled structured operators (ops/qp.py) represent the
SAME QP as the reference's dense physical-time assembly, through the exact
variable/row scaling maps documented in ops/bases.py.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from allocnet_tpu.config import QPConfig
from allocnet_tpu.ops import qp
from allocnet_tpu.utils import scenarios
from tests.oracle import qp_oracle


def _build(order=4, res=10, batch=3, seed=0):
    cfg = QPConfig(order=order, res=res, max_vel=4.0, max_acc=6.0)
    sc = scenarios.random_scenarios(cfg, batch, seed=seed, min_seg=1)
    data = qp.build_qp(cfg, jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                       jnp.asarray(sc.times), jnp.asarray(sc.seg))
    return cfg, sc, data


@pytest.mark.parametrize("order", [3, 4])
def test_operator_parity(order):
    cfg, sc, data = _build(order=order, batch=4, seed=1)
    D, S = cfg.D, cfg.max_seg
    rng = np.random.default_rng(2)

    # random physical coefficients, zero on padded segments
    c_phys = rng.normal(size=(4, S, 3, D))
    for b in range(4):
        c_phys[b, sc.seg[b]:] = 0.0
    x_scaled = qp.scale_coeffs(data, jnp.asarray(c_phys))

    out = qp.apply_A(data, x_scaled)

    for b in range(4):
        L = int(sc.seg[b])
        T = sc.times[b]
        # expected start/end residual rows from physical coefficients
        for j in range(3):
            for r in range(3):
                ref_row = qp_oracle.t_state(order, 0.0)[r]
                val = ref_row @ c_phys[b, 0, j]
                np.testing.assert_allclose(
                    np.asarray(out['start'])[b, j, r], val * T[0] ** r,
                    rtol=1e-9, atol=1e-9)
                ref_row = qp_oracle.t_state(order, T[L - 1])[r]
                val = ref_row @ c_phys[b, L - 1, j]
                np.testing.assert_allclose(
                    np.asarray(out['end'])[b, j, r], val * T[L - 1] ** r,
                    rtol=1e-9, atol=1e-8)
        # continuity rows (active junctions), scaled by T_i^r and the
        # junction row normalization d = 1/max(1, kappa_r * r!)
        import math as _math
        for i in range(L - 1):
            for j in range(3):
                for r in range(order):
                    left = qp_oracle.t_state(order, T[i])[r] @ c_phys[b, i, j]
                    right = qp_oracle.t_state(order, 0.0)[r] @ c_phys[b, i + 1, j]
                    kap = (T[i] / T[i + 1]) ** r
                    d = 1.0 / max(1.0, kap * _math.factorial(r))
                    np.testing.assert_allclose(
                        np.asarray(out['junc'])[b, i, j, r],
                        (left - right) * T[i] ** r * d, rtol=1e-8, atol=1e-8)
        # corridor + box rows at sample points
        for i in range(L):
            for s in range(cfg.res):
                tt = T[i] * s / cfg.res
                basis = qp_oracle.t_state(order, tt)
                pos = np.array([basis[0] @ c_phys[b, i, j] for j in range(3)])
                vel = np.array([basis[1] @ c_phys[b, i, j] for j in range(3)])
                acc = np.array([basis[2] @ c_phys[b, i, j] for j in range(3)])
                faces = sc.hpolys[b, i]
                nf = int((np.linalg.norm(faces[:, :3], axis=1) > 1e-6).sum())
                np.testing.assert_allclose(
                    np.asarray(out['corr'])[b, i, s, :nf],
                    faces[:nf, :3] @ pos, rtol=1e-8, atol=1e-8)
                expect_box = np.stack([vel * T[i], acc * T[i] ** 2,
                                       -vel * T[i], -acc * T[i] ** 2], axis=-1)
                np.testing.assert_allclose(
                    np.asarray(out['box'])[b, i, s], expect_box,
                    rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("order", [3, 4])
def test_objective_parity(order):
    cfg, sc, data = _build(order=order, batch=4, seed=3)
    rng = np.random.default_rng(4)
    c_phys = rng.normal(size=(4, cfg.max_seg, 3, cfg.D))
    for b in range(4):
        c_phys[b, sc.seg[b]:] = 0.0
    x_scaled = qp.scale_coeffs(data, jnp.asarray(c_phys))
    obj = np.asarray(qp.objective(data, x_scaled))
    for b in range(4):
        L = int(sc.seg[b])
        expect = 0.0
        for i in range(L):
            cq = qp_oracle.cost_block(order, sc.times[b, i])
            for j in range(3):
                c = c_phys[b, i, j, :order]
                expect += 0.5 * c @ cq @ c
        np.testing.assert_allclose(obj[b], expect, rtol=1e-9)


def test_dense_eq_matches_apply_A():
    cfg, sc, data = _build(order=4, batch=3, seed=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(3, cfg.max_seg, 3, cfg.D)))
    Aeq, beq = qp.dense_eq(data)
    out = qp.apply_A(data, x)
    eq_flat = qp.tree_flat({k: out[k] for k in qp.EQ_KEYS}, qp.EQ_KEYS)
    dense_val = jnp.einsum('bmn,bn->bm', Aeq, x.reshape(3, -1))
    np.testing.assert_allclose(np.asarray(dense_val), np.asarray(eq_flat),
                               rtol=1e-9, atol=1e-9)


def test_normal_matrix_matches_operators():
    """M == sigma I + P + sum_leaf rho_leaf A_leaf^T A_leaf, verified by
    applying both sides to random vectors."""
    cfg, sc, data = _build(order=4, batch=3, seed=7)
    rng = np.random.default_rng(8)
    B = 3
    x = jnp.asarray(rng.normal(size=(B, cfg.max_seg, 3, cfg.D)))
    sigma, rho_e, rho_i = 1e-6, 50.0, 0.7
    M = qp.normal_matrix(data, sigma, jnp.full((B,), rho_e), jnp.full((B,), rho_i))
    lhs = jnp.einsum('bnm,bm->bn', M, x.reshape(B, -1))

    ax = qp.apply_A(data, x)
    rho = {k: rho_e for k in qp.EQ_KEYS} | {k: rho_i for k in qp.INEQ_KEYS}
    scaled = {k: ax[k] * rho[k] for k in ax}
    rhs = (sigma * x + qp.apply_P(data, x) + qp.apply_AT(data, scaled)).reshape(B, -1)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-7, atol=1e-7)


def test_infer_seg():
    cfg = QPConfig()
    sc = scenarios.random_scenarios(cfg, 6, seed=9, min_seg=1)
    got = np.asarray(qp.infer_seg(jnp.asarray(sc.hpolys)))
    np.testing.assert_array_equal(got, sc.seg)
