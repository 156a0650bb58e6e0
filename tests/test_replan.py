"""Warm-started replanning: reduced-budget warm solves must match cold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from allocnet_tpu.config import AllocNetConfig, QPConfig, SolverConfig
from allocnet_tpu.models import import_torch
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.planner import replan
from allocnet_tpu.utils import scenarios


def test_warm_start_matches_cold():
    """Warm solve at 1/3 budget from the previous solution must reach the
    same polished solution as a cold full-budget solve when the scenario is
    only slightly perturbed (consecutive replanning ticks)."""
    cfg = QPConfig(res=10)
    cold = SolverConfig(n_chunks=2, iters_per_chunk=100)
    warm = replan.warm_solver_config(cold)
    assert warm.n_chunks * warm.iters_per_chunk < cold.n_chunks * cold.iters_per_chunk

    sc = scenarios.random_scenarios(cfg, 4, seed=71, min_seg=2)
    data = qp.build_qp(cfg, jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                       jnp.asarray(sc.times), jnp.asarray(sc.seg))
    sol0 = admm.solve_qp(data, cold)
    assert np.asarray(sol0.solved).all()

    # perturb times ~2% (a replanning tick with slightly different inference)
    times2 = jnp.asarray(sc.times) * 1.02
    data2 = qp.build_qp(cfg, jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                        times2, jnp.asarray(sc.seg))
    ref = admm.solve_qp(data2, cold)

    x0 = qp.scale_coeffs(data2, sol0.coeffs)
    warm_sol = admm.solve_qp(data2, warm, x0=x0)

    both = np.asarray(ref.solved) & np.asarray(warm_sol.solved)
    assert both.sum() >= 3
    diff = np.abs(np.asarray(warm_sol.coeffs) - np.asarray(ref.coeffs))
    assert diff[both].max() < 1e-3

    # cold solve at the warm budget fails where the warm one succeeds
    cold_short = admm.solve_qp(data2, warm)
    assert np.asarray(warm_sol.pri_res).max() <= np.asarray(cold_short.pri_res).max() + 1e-9


def test_replan_loop_with_network():
    cfg = AllocNetConfig(qp=QPConfig(res=10),
                         solver=SolverConfig(n_chunks=2, iters_per_chunk=100))
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(jnp.asarray, import_torch.load_torchscript_lstm(
        "/root/reference/src/planner/models/seq5_tokenthresh0_35_cpu.pt"))

    sc = scenarios.random_scenarios(cfg.qp, 2, seed=73, min_seg=2)
    st = jnp.asarray(sc.state, jnp.float32)
    hp = jnp.asarray(sc.hpolys, jnp.float32)
    seg = jnp.asarray(sc.seg)

    prev = replan.init_state(2, cfg)
    step = jax.jit(lambda s_, h_, g_, p_: replan.replan_step(
        net, params, cfg, s_, h_, g_, p_))
    for _ in range(3):
        times, coeffs, solved, prev = step(st, hp, seg, prev)
    assert np.all(np.isfinite(np.asarray(coeffs)))
    assert prev.have_prev.dtype == bool


@pytest.mark.slow
def test_replan_step_with_refinement():
    """refine_steps>0 inside the replan tick: still solves, conserves the
    predicted total duration, and never raises the QP objective."""
    cfg = AllocNetConfig(qp=QPConfig(res=10),
                         solver=SolverConfig(n_chunks=2, iters_per_chunk=100))
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(jnp.asarray, import_torch.load_torchscript_lstm(
        "/root/reference/src/planner/models/seq5_tokenthresh0_35_cpu.pt"))

    sc = scenarios.random_scenarios(cfg.qp, 2, seed=73, min_seg=2)
    st = jnp.asarray(sc.state, jnp.float32)
    hp = jnp.asarray(sc.hpolys, jnp.float32)
    seg = jnp.asarray(sc.seg)
    prev = replan.init_state(2, cfg)

    t_base, c_base, s_base, _ = jax.jit(
        lambda: replan.replan_step(net, params, cfg, st, hp, seg, prev,
                                   warm=False))()
    t_ref, c_ref, s_ref, _ = jax.jit(
        lambda: replan.replan_step(net, params, cfg, st, hp, seg, prev,
                                   warm=False, refine_steps=2))()

    assert np.all(np.isfinite(np.asarray(c_ref)))
    base_solved = np.asarray(s_base)
    # refinement must not lose solved scenarios
    assert (np.asarray(s_ref) | ~base_solved).all()
    # total predicted duration conserved where the baseline solved
    np.testing.assert_allclose(
        np.asarray(t_ref).sum(1)[base_solved],
        np.asarray(t_base).sum(1)[base_solved], rtol=1e-5)
