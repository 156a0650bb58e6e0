"""Implicit-KKT gradients vs central finite differences.

The reference checks nothing here (its OsqpLayer hook is untested); we verify
the custom_vjp against finite differences of the (high-accuracy) solver
itself, in f64 where FD is trustworthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import qp_diff
from allocnet_tpu.utils import scenarios

CFG = QPConfig(order=4, res=10)
SCFG = SolverConfig(n_chunks=2, iters_per_chunk=75, polish_rounds=2)


def _loss(state, hpolys, times, seg, weights):
    coeffs, sol = qp_diff.solve(CFG, SCFG, state, hpolys, times, seg)
    return jnp.sum(weights * coeffs)


def test_gradient_matches_fd_times():
    sc = scenarios.random_scenarios(CFG, 3, seed=31, min_seg=2)
    rng = np.random.default_rng(4)
    weights = jnp.asarray(rng.normal(size=(3, CFG.max_seg, 3, CFG.D)))
    args = (jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
            jnp.asarray(sc.times), jnp.asarray(sc.seg))

    g_times = jax.grad(_loss, argnums=2)(*args, weights)
    g_times = np.asarray(g_times)

    eps = 1e-5
    for b in range(3):
        for i in range(int(sc.seg[b])):
            tp = np.array(sc.times); tp[b, i] += eps
            tm = np.array(sc.times); tm[b, i] -= eps
            fp = float(_loss(args[0], args[1], jnp.asarray(tp), args[3], weights))
            fm = float(_loss(args[0], args[1], jnp.asarray(tm), args[3], weights))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(g_times[b, i], fd, rtol=5e-3, atol=1e-5)


def test_gradient_matches_fd_state():
    sc = scenarios.random_scenarios(CFG, 2, seed=33, min_seg=2)
    rng = np.random.default_rng(6)
    weights = jnp.asarray(rng.normal(size=(2, CFG.max_seg, 3, CFG.D)))
    args = (jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
            jnp.asarray(sc.times), jnp.asarray(sc.seg))

    g_state = np.asarray(jax.grad(_loss, argnums=0)(*args, weights))

    eps = 1e-5
    rngsel = np.random.default_rng(7)
    for _ in range(8):
        b = int(rngsel.integers(0, 2))
        i = int(rngsel.integers(0, 2))
        j = int(rngsel.integers(0, 3))
        r = int(rngsel.integers(0, 3))
        sp = np.array(sc.state); sp[b, i, j, r] += eps
        sm = np.array(sc.state); sm[b, i, j, r] -= eps
        fp = float(_loss(jnp.asarray(sp), args[1], args[2], args[3], weights))
        fm = float(_loss(jnp.asarray(sm), args[1], args[2], args[3], weights))
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(g_state[b, i, j, r], fd, rtol=5e-3, atol=1e-5)


def test_objective_gradient_through_solution():
    """d(obj)/d(times) via the differentiable pipeline (the objc loss path)."""
    sc = scenarios.random_scenarios(CFG, 2, seed=35, min_seg=2)
    args = (jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
            jnp.asarray(sc.times), jnp.asarray(sc.seg))

    def obj_loss(times):
        coeffs, sol = qp_diff.solve(CFG, SCFG, args[0], args[1], times, args[3])
        return jnp.sum(qp_diff.objective(CFG, args[0], args[1], times, args[3],
                                         coeffs))

    g = np.asarray(jax.grad(obj_loss)(args[2]))
    eps = 1e-5
    for b in range(2):
        for i in range(int(sc.seg[b])):
            tp = np.array(sc.times); tp[b, i] += eps
            tm = np.array(sc.times); tm[b, i] -= eps
            fd = (float(obj_loss(jnp.asarray(tp)))
                  - float(obj_loss(jnp.asarray(tm)))) / (2 * eps)
            np.testing.assert_allclose(g[b, i], fd, rtol=1e-2, atol=1e-5)
    # longer times must never increase the optimal smoothness cost much;
    # typically strictly decrease it (sanity on sign)
    assert np.mean(g) < 0


def test_unsolved_scenarios_zero_grad():
    sc = scenarios.random_scenarios(CFG, 2, seed=37, min_seg=2)
    times = jnp.asarray(np.full_like(sc.times, 0.05))   # infeasible
    g = jax.grad(lambda t: _loss(jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                                 t, jnp.asarray(sc.seg),
                                 jnp.ones((2, CFG.max_seg, 3, CFG.D))))(times)
    assert np.allclose(np.asarray(g), 0.0)
