"""Trajectory evaluation + flatness map parity tests."""

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import PhysParams, QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.planner import flatness, trajectory
from allocnet_tpu.utils import scenarios
from tests.oracle import flatness_oracle, qp_oracle


import functools


@functools.lru_cache(maxsize=None)
def _solved_trajs(batch=4, seed=21):
    cfg = QPConfig(order=4, res=10)
    sc = scenarios.random_scenarios(cfg, batch, seed=seed, min_seg=1)
    solve = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
        qp.build_qp(cfg, st, hp, tm, sg), SolverConfig()))
    sol = solve(jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                jnp.asarray(sc.times), jnp.asarray(sc.seg))
    traj = trajectory.from_solution(sol.coeffs, jnp.asarray(sc.times),
                                    jnp.asarray(sc.seg))
    return cfg, sc, traj


def test_eval_matches_reference_basis():
    cfg, sc, traj = _solved_trajs()
    B = sc.state.shape[0]
    rng = np.random.default_rng(3)
    total = np.asarray(traj.total_time)
    t = rng.uniform(0, total)            # (B,) random global times
    out = np.asarray(trajectory.eval_state(traj, jnp.asarray(t), max_deriv=2))
    coeffs = np.asarray(traj.coeffs)
    for b in range(B):
        # locate segment manually
        rem, i = t[b], 0
        while rem > sc.times[b, i] and i < sc.seg[b] - 1:
            rem -= sc.times[b, i]
            i += 1
        basis = qp_oracle.t_state(cfg.order, rem)
        for r in range(3):
            expect = coeffs[b, i] @ basis[r]
            np.testing.assert_allclose(out[b, r], expect, rtol=1e-8, atol=1e-8)


def test_endpoints_and_sampling():
    cfg, sc, traj = _solved_trajs()
    t0 = jnp.zeros(traj.coeffs.shape[0])
    s0 = np.asarray(trajectory.eval_state(traj, t0, max_deriv=2))
    np.testing.assert_allclose(s0.transpose(0, 2, 1), sc.state[:, 0], atol=1e-4)
    sT = np.asarray(trajectory.eval_state(traj, traj.total_time, max_deriv=2))
    np.testing.assert_allclose(sT.transpose(0, 2, 1), sc.state[:, 1], atol=1e-4)
    # max rates within configured limits for solved scenarios
    vmax, amax = trajectory.max_rates(traj)
    assert np.all(np.asarray(vmax) <= np.sqrt(3) * cfg.max_vel + 1e-3)
    assert np.all(np.asarray(amax) <= np.sqrt(3) * cfg.max_acc + 1e-3)


def test_snap_cost_matches_objective():
    cfg, sc, traj = _solved_trajs()
    solve = jax.jit(lambda st, hp, tm, sg: admm.solve_qp(
        qp.build_qp(cfg, st, hp, tm, sg), SolverConfig()))
    sol = solve(jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                jnp.asarray(sc.times), jnp.asarray(sc.seg))
    cost = np.asarray(trajectory.snap_cost(traj, cfg.order, reference_compat=True))
    np.testing.assert_allclose(cost, np.asarray(sol.obj) * 2.0, rtol=1e-5)
    # the exact Gram differs only via the reference's m_34 typo (~10%)
    exact = np.asarray(trajectory.snap_cost(traj, cfg.order))
    np.testing.assert_allclose(exact, cost, rtol=0.25)


def test_flatness_forward_parity():
    phys = PhysParams()
    rng = np.random.default_rng(5)
    B = 16
    vel = rng.normal(size=(B, 3)) * 3
    acc = rng.normal(size=(B, 3)) * 2
    jer = rng.normal(size=(B, 3)) * 5
    psi = rng.uniform(-np.pi, np.pi, B)
    dpsi = rng.normal(size=B)
    out = flatness.forward(phys, jnp.asarray(vel), jnp.asarray(acc),
                           jnp.asarray(jer), jnp.asarray(psi), jnp.asarray(dpsi))
    for b in range(B):
        thr, quat, omg = flatness_oracle.forward(
            phys, vel[b], acc[b], jer[b], psi[b], dpsi[b])
        np.testing.assert_allclose(float(out.thrust[b]), thr, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(out.quat[b]), quat, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.omega[b]), omg, rtol=1e-9, atol=1e-10)


def test_flatness_backward_matches_fd():
    """jax.vjp adjoint (replacing the hand-coded flatness.hpp:136-260
    backward) vs central finite differences."""
    phys = PhysParams()
    rng = np.random.default_rng(7)
    vel = jnp.asarray(rng.normal(size=(1, 3)))
    acc = jnp.asarray(rng.normal(size=(1, 3)))
    jer = jnp.asarray(rng.normal(size=(1, 3)))
    psi = jnp.asarray(rng.normal(size=(1,)))
    dpsi = jnp.asarray(rng.normal(size=(1,)))
    cot = flatness.FlatOutputs(
        thrust=jnp.asarray(rng.normal(size=(1,))),
        quat=jnp.asarray(rng.normal(size=(1, 4))),
        omega=jnp.asarray(rng.normal(size=(1, 3))))

    grads = flatness.backward(phys, vel, acc, jer, psi, dpsi,
                              cot.thrust, cot.quat, cot.omega)

    def scalar_fn(v, a, j, p, dp):
        out = flatness.forward(phys, v, a, j, p, dp)
        return (jnp.sum(out.thrust * cot.thrust) + jnp.sum(out.quat * cot.quat)
                + jnp.sum(out.omega * cot.omega))

    eps = 1e-6
    args = [vel, acc, jer, psi, dpsi]
    for ai, g in enumerate(grads):
        a = args[ai]
        flat = np.asarray(a).ravel()
        for k in range(flat.size):
            d = np.zeros_like(flat); d[k] = eps
            ap = jnp.asarray((flat + d).reshape(a.shape))
            am = jnp.asarray((flat - d).reshape(a.shape))
            args_p = list(args); args_p[ai] = ap
            args_m = list(args); args_m[ai] = am
            fd = (float(scalar_fn(*args_p)) - float(scalar_fn(*args_m))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g).ravel()[k], fd,
                                       rtol=2e-4, atol=2e-6)
