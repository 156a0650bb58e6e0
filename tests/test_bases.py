"""Basis/Gram parity vs the reference's closed forms."""

import numpy as np

from allocnet_tpu.ops import bases
from tests.oracle import qp_oracle


def test_gram_matches_reference_cost_block():
    # reference CostQ closed forms (qp_solver.hpp:197-235) at t=1 equal the
    # unit-interval Gram matrix
    for order in (3, 4):
        Qhat = bases.gram_matrix(order)
        ref = qp_oracle.cost_block(order, 1.0)
        np.testing.assert_allclose(Qhat[:order, :order], ref, rtol=1e-12)
        assert np.all(Qhat[order:, :] == 0) and np.all(Qhat[:, order:] == 0)


def test_gram_snap_literals():
    Q = bases.gram_matrix(4)
    expect = np.array([
        [100800, 50400, 20160, 5040],
        [50400, 25920, 10800, 2880],
        [20160, 10800, 4800, 1400],
        [5040, 2880, 1400, 576],
    ], dtype=float)
    np.testing.assert_allclose(Q[:4, :4], expect, rtol=1e-12)
    # the mathematically exact snap Gram fixes the reference's m_34 typo
    Qx = bases.gram_matrix(4, reference_compat=False)
    assert Qx[2, 3] == Qx[3, 2] == 1440.0


def test_gram_jerk_literals():
    Q = bases.gram_matrix(3)
    expect = np.array([[720, 360, 120], [360, 192, 72], [120, 72, 36]], float)
    np.testing.assert_allclose(Q[:3, :3], expect, rtol=1e-12)


def test_basis_row_matches_t_state_scaled():
    # beta_r(tau) with column scaling T^{D-1-k} and row scaling T^r equals the
    # reference's physical-time rows at t = tau * T
    rng = np.random.default_rng(0)
    for order in (3, 4):
        D = 2 * order
        T = 1.7
        for tau in (0.0, 0.3, 1.0):
            ref = qp_oracle.t_state(order, tau * T)
            for r in range(order):
                mine = bases.basis_row(D, r, tau)
                colscale = T ** np.arange(D - 1, -1, -1)
                np.testing.assert_allclose(
                    mine * colscale / T**r, ref[r], rtol=1e-12, atol=1e-12)


def test_zero_basis_matches_reference_zero_A():
    # reference zero_A (qp_solver.hpp:69-81)
    z4 = bases.boundary_bases(8, 4, 0.0)
    expect = np.zeros((4, 8))
    expect[0, 7], expect[1, 6], expect[2, 5], expect[3, 4] = 1, 1, 2, 6
    np.testing.assert_allclose(z4, expect)
    z3 = bases.boundary_bases(6, 3, 0.0)
    expect = np.zeros((3, 6))
    expect[0, 5], expect[1, 4], expect[2, 3] = 1, 1, 2
    np.testing.assert_allclose(z3, expect)
