"""Fused Pallas ADMM kernel vs the XLA scan path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.ops.pallas import admm_kernel as K
from allocnet_tpu.utils import scenarios


def test_kernel_full_solve_matches_xla():
    """ADMM core swapped for the Pallas kernel (interpret mode) must produce
    the same post-polish solutions and flags as the XLA path."""
    cfg = QPConfig()
    scfg = SolverConfig(n_chunks=2, iters_per_chunk=75)
    sc = scenarios.random_scenarios(cfg, 8, seed=5, min_seg=1)
    data = qp.build_qp(cfg, jnp.asarray(sc.state, jnp.float32),
                       jnp.asarray(sc.hpolys, jnp.float32),
                       jnp.asarray(sc.times, jnp.float32),
                       jnp.asarray(sc.seg))
    ref = admm.solve_qp(data, scfg)

    orig = admm.admm_solve
    admm.admm_solve = lambda d, s, x0=None: K.admm_solve_pallas(
        d, s, x0, interpret=True)
    try:
        sol = admm._solve_qp_impl(data, scfg, None)
    finally:
        admm.admm_solve = orig

    np.testing.assert_array_equal(np.asarray(sol.solved),
                                  np.asarray(ref.solved))
    both = np.asarray(sol.solved) & np.asarray(ref.solved)
    diff = np.abs(np.asarray(sol.coeffs) - np.asarray(ref.coeffs))
    assert diff[both].max() < 1e-3


def test_supported_gate():
    assert K.supported(QPConfig())
    assert not K.supported(QPConfig(order=3))
    assert not K.supported(QPConfig(res=10))
