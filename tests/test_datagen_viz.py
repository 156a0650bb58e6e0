"""Dataset generation + visualization artifact smoke tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow     # full datagen round-trips: ~2 min

from allocnet_tpu.config import AllocNetConfig, QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.train import datagen, dataset as ds_lib
from allocnet_tpu.utils import scenarios
from allocnet_tpu.planner import trajectory
from allocnet_tpu.viz import artifacts


def test_generate_dataset_roundtrip(tmp_path):
    cfg = AllocNetConfig(qp=QPConfig(res=10))
    path = str(tmp_path / "dataset.h5")
    sc = datagen.generate(cfg, n_samples=6, out_path=path, seed=5)
    # generation certifies samples (drops reference-time-infeasible ones)
    n = sc.state.shape[0]
    assert 2 <= n <= 6
    assert np.all(sc.seg >= 1) and np.all(sc.seg <= cfg.qp.max_seg)
    back = ds_lib.read_h5(path, cfg.qp)
    np.testing.assert_allclose(back.times, sc.times, atol=1e-12)

    # generated corridors must contain their endpoints
    for b in range(n):
        L = int(sc.seg[b])
        first = sc.hpolys[b, 0]
        mask = np.linalg.norm(first[:, :3], axis=1) > 1e-6
        start = sc.state[b, 0, :, 0]
        assert np.all(first[mask, :3] @ start <= first[mask, 3] + 1e-5)

    # every certified sample must re-solve with the reference times at the
    # certification operating point AND the certification dtype (f32 — the
    # production datagen/training path).  The invariant is dtype-specific:
    # conftest enables x64, and re-solving the same batch in f64 is a
    # DIFFERENT solver trajectory that can stall its duals on near-degenerate
    # corridors the f32 polish certifies (root-caused r5: seed-5 sample 3
    # reaches the same objective with dua_rel 3.4e-3 in f64 vs 4.1e-4 in
    # f32) — asserting f64 here over-claims what the gate guarantees.
    from allocnet_tpu.config import CERTIFY_SOLVER
    data = qp.build_qp(cfg.qp,
                       jnp.asarray(sc.state, jnp.float32),
                       jnp.asarray(sc.hpolys, jnp.float32),
                       jnp.asarray(sc.times, jnp.float32),
                       jnp.asarray(sc.seg))
    sol = admm.solve_qp(data, CERTIFY_SOLVER)
    assert int(np.asarray(sol.solved).sum()) == n


def test_viz_artifacts(tmp_path):
    cfg = QPConfig(res=10)
    sc = scenarios.random_scenarios(cfg, 2, seed=9, min_seg=2)
    data = qp.build_qp(cfg, jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                       jnp.asarray(sc.times), jnp.asarray(sc.seg))
    sol = admm.solve_qp(data, SolverConfig())
    traj = trajectory.from_solution(sol.coeffs, jnp.asarray(sc.times),
                                    jnp.asarray(sc.seg))

    p1 = artifacts.plot_trajectory(traj, 0, str(tmp_path / "traj.png"))
    assert os.path.getsize(p1) > 1000

    from allocnet_tpu.config import PhysParams
    p2 = artifacts.plot_trajectory(traj, 0, str(tmp_path / "flat.png"),
                                   phys=PhysParams())
    assert os.path.getsize(p2) > 1000

    polys = [sc.hpolys[0, i][np.linalg.norm(sc.hpolys[0, i, :, :3], axis=1) > 0]
             for i in range(int(sc.seg[0]))]
    _, states = trajectory.sample(traj, 50, max_deriv=0)
    pts = np.asarray(states)[0, :, 0, :]
    p3 = artifacts.plot_corridor_3d(polys, pts, None,
                                    str(tmp_path / "corridor.png"))
    assert os.path.getsize(p3) > 1000
