"""Implicit-KKT gradients vs central finite differences.

The reference checks nothing here (its OsqpLayer hook is untested); we verify
the custom_vjp against finite differences of the (high-accuracy) solver
itself, in f64 where FD is trustworthy.

All FD probes for a test are stacked into ONE batched, jitted solve (the
probes are independent scenarios, so this is exactly the solver's production
shape) — the assertions are identical to evaluating each probe serially but
the suite pays one compile + one batched solve instead of ~30 eager solves.
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


@jax.jit
def _loss_per_sample(state, hpolys, times, seg, weights):
    coeffs, _ = qp_diff.solve(CFG, SCFG, state, hpolys, times, seg)
    return jnp.sum(weights * coeffs, axis=(1, 2, 3))


def _fd_batch(sc, weights, perturb):
    """Evaluate the loss at +eps/-eps for every probe in one batched solve.

    perturb: list of (b, setter) where setter(times_or_state, sign*eps)
    returns the perturbed array for scenario b.  Returns the FD estimates.
    """
    eps = 1e-5
    states, hps, ts, segs, ws = [], [], [], [], []
    for b, setter in perturb:
        for sign in (+eps, -eps):
            s, t = setter(sign)
            states.append(s[b])
            hps.append(sc.hpolys[b])
            ts.append(t[b])
            segs.append(sc.seg[b])
            ws.append(np.asarray(weights)[b])
    vals = np.asarray(_loss_per_sample(
        jnp.asarray(np.stack(states)), jnp.asarray(np.stack(hps)),
        jnp.asarray(np.stack(ts)), jnp.asarray(np.stack(segs)),
        jnp.asarray(np.stack(ws))))
    return (vals[0::2] - vals[1::2]) / (2 * eps)


def test_gradient_matches_fd_times():
    sc = scenarios.random_scenarios(CFG, 3, seed=31, min_seg=2)
    rng = np.random.default_rng(4)
    weights = jnp.asarray(rng.normal(size=(3, CFG.max_seg, 3, CFG.D)))
    args = (jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
            jnp.asarray(sc.times), jnp.asarray(sc.seg))

    g_times = np.asarray(jax.jit(jax.grad(_loss, argnums=2))(*args, weights))

    probes = [(b, i) for b in range(3) for i in range(int(sc.seg[b]))]

    def make_setter(b, i):
        def setter(d):
            tp = np.array(sc.times)
            tp[b, i] += d
            return np.array(sc.state), tp
        return setter

    fd = _fd_batch(sc, weights, [(b, make_setter(b, i)) for b, i in probes])
    for k, (b, i) in enumerate(probes):
        np.testing.assert_allclose(g_times[b, i], fd[k], rtol=5e-3, atol=1e-5)


def test_gradient_matches_fd_state():
    sc = scenarios.random_scenarios(CFG, 2, seed=33, min_seg=2)
    rng = np.random.default_rng(6)
    weights = jnp.asarray(rng.normal(size=(2, CFG.max_seg, 3, CFG.D)))
    args = (jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
            jnp.asarray(sc.times), jnp.asarray(sc.seg))

    g_state = np.asarray(jax.jit(jax.grad(_loss, argnums=0))(*args, weights))

    rngsel = np.random.default_rng(7)
    probes = [(int(rngsel.integers(0, 2)), int(rngsel.integers(0, 2)),
               int(rngsel.integers(0, 3)), int(rngsel.integers(0, 3)))
              for _ in range(8)]

    def make_setter(b, i, j, r):
        def setter(d):
            sp = np.array(sc.state)
            sp[b, i, j, r] += d
            return sp, np.array(sc.times)
        return setter

    fd = _fd_batch(sc, weights, [(b, make_setter(b, i, j, r))
                                 for b, i, j, r in probes])
    for k, (b, i, j, r) in enumerate(probes):
        np.testing.assert_allclose(g_state[b, i, j, r], fd[k],
                                   rtol=5e-3, atol=1e-5)


def test_objective_gradient_through_solution():
    """d(obj)/d(times) via the differentiable pipeline (the objc loss path)."""
    sc = scenarios.random_scenarios(CFG, 2, seed=35, min_seg=2)
    args = (jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
            jnp.asarray(sc.times), jnp.asarray(sc.seg))

    def obj_loss(times):
        coeffs, sol = qp_diff.solve(CFG, SCFG, args[0], args[1], times, args[3])
        return jnp.sum(qp_diff.objective(CFG, args[0], args[1], times, args[3],
                                         coeffs))

    @jax.jit
    def obj_per_sample(state, hpolys, times, seg):
        coeffs, _ = qp_diff.solve(CFG, SCFG, state, hpolys, times, seg)
        return qp_diff.objective(CFG, state, hpolys, times, seg, coeffs)

    g = np.asarray(jax.jit(jax.grad(obj_loss))(args[2]))

    eps = 1e-5
    probes = [(b, i) for b in range(2) for i in range(int(sc.seg[b]))]
    states, hps, ts, segs = [], [], [], []
    for b, i in probes:
        for sign in (+eps, -eps):
            tp = np.array(sc.times)
            tp[b, i] += sign
            states.append(sc.state[b]); hps.append(sc.hpolys[b])
            ts.append(tp[b]); segs.append(sc.seg[b])
    vals = np.asarray(obj_per_sample(
        jnp.asarray(np.stack(states)), jnp.asarray(np.stack(hps)),
        jnp.asarray(np.stack(ts)), jnp.asarray(np.stack(segs))))
    fd = (vals[0::2] - vals[1::2]) / (2 * eps)
    for k, (b, i) in enumerate(probes):
        np.testing.assert_allclose(g[b, i], fd[k], rtol=1e-2, atol=1e-5)
    # longer times must never increase the optimal smoothness cost much;
    # typically strictly decrease it (sanity on sign)
    assert np.mean(g) < 0


def test_unsolved_scenarios_zero_grad():
    sc = scenarios.random_scenarios(CFG, 2, seed=37, min_seg=2)
    times = jnp.asarray(np.full_like(sc.times, 0.05))   # infeasible
    g = jax.jit(jax.grad(
        lambda t: _loss(jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                        t, jnp.asarray(sc.seg),
                        jnp.ones((2, CFG.max_seg, 3, CFG.D)))))(times)
    assert np.allclose(np.asarray(g), 0.0)
