"""Tiled fused Pallas ADMM kernel vs the XLA scan path (interpret on CPU).

The kernel itself (allocnet_tpu/ops/pallas/admm_tiled.py) is the TPU-native
replacement for the reference's serial OSQP calls (qp_solver.hpp:298-358);
on-chip it is benchmarked by bench.py.  Here interpret mode checks the
layout-exotic packing (transposed row space, scaled duals, fused refined
inverse) against the plain XLA ADMM on identical scenarios.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.ops.pallas import admm_tiled as K
from allocnet_tpu.utils import scenarios


def _solve_both(cfg, scfg, sc):
    data = qp.build_qp(cfg, jnp.asarray(sc.state, jnp.float32),
                       jnp.asarray(sc.hpolys, jnp.float32),
                       jnp.asarray(sc.times, jnp.float32),
                       jnp.asarray(sc.seg))
    ref = admm.solve_qp(data, scfg)

    orig = admm.admm_solve
    admm.admm_solve = lambda d, s, x0=None, y0=None: K.admm_solve_tiled(
        d, s, x0, y0, interpret=True)
    try:
        sol = admm._solve_qp_impl(data, scfg, None, None)
    finally:
        admm.admm_solve = orig
    return ref, sol


@pytest.mark.slow
def test_tiled_full_solve_matches_xla():
    """ADMM core swapped for the tiled Pallas kernel (interpret mode) must
    produce the same post-polish solutions and flags as the XLA path."""
    cfg = QPConfig()
    scfg = SolverConfig(n_chunks=2, iters_per_chunk=75, use_pallas=False)
    sc = scenarios.random_scenarios(cfg, 8, seed=5, min_seg=1)
    ref, sol = _solve_both(cfg, scfg, sc)

    np.testing.assert_array_equal(np.asarray(sol.solved),
                                  np.asarray(ref.solved))
    both = np.asarray(sol.solved) & np.asarray(ref.solved)
    assert both.any()
    diff = np.abs(np.asarray(sol.coeffs) - np.asarray(ref.coeffs))
    assert diff[both].max() < 1e-3


@pytest.mark.slow
def test_tiled_training_shape():
    """The TRAIN operating point (res=10, min-snap) solves identically too --
    the tiled kernel supports every padded shape, unlike its per-scenario
    predecessor."""
    cfg = QPConfig(res=10)
    scfg = SolverConfig(n_chunks=2, iters_per_chunk=75, use_pallas=False)
    sc = scenarios.random_scenarios(cfg, 4, seed=11, min_seg=2)
    ref, sol = _solve_both(cfg, scfg, sc)
    both = np.asarray(sol.solved) & np.asarray(ref.solved)
    assert both.any()
    diff = np.abs(np.asarray(sol.coeffs) - np.asarray(ref.coeffs))
    assert diff[both].max() < 1e-3


def test_supported_gate():
    assert K.supported(QPConfig())
    assert K.supported(QPConfig(res=10))
    assert K.supported(QPConfig(order=3))
    assert not K.supported(QPConfig(max_faces=60))
