"""Auxiliary subsystems: evaluation harness, export, PCD IO, timing, control
loop, ablation preset, CLI smoke."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import (ABLATION_SUPERVISED, AllocNetConfig,
                                 PhysParams, QPConfig, SolverConfig)
from allocnet_tpu.models import import_torch
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.planner import control, trajectory
from allocnet_tpu.train import evaluate
from allocnet_tpu.utils import pcd, scenarios, timing

CKPT = "/root/reference/src/planner/models/seq5_tokenthresh0_35_cpu.pt"


def test_evaluate_report():
    cfg = AllocNetConfig(qp=QPConfig(res=10),
                         solver=SolverConfig(n_chunks=2, iters_per_chunk=75))
    sc = scenarios.random_scenarios(cfg.qp, 8, seed=61, min_seg=1)
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(jnp.asarray, import_torch.load_torchscript_lstm(CKPT))
    rep = evaluate.evaluate(net, params, cfg, sc, batch_size=8)
    assert rep.n == 8
    assert 0.0 <= rep.success_rate <= 1.0
    assert 0.0 <= rep.stop_token_accuracy <= 1.0
    assert np.isfinite(rep.mean_time_ratio)


def test_export_roundtrip(tmp_path):
    from allocnet_tpu.models import export as export_lib
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        import_torch.load_torchscript_lstm(CKPT))
    path = str(tmp_path / "exported")
    export_lib.save(path, net, params, batch=1, seq_len=5)
    assert os.path.getsize(os.path.join(path, "model.stablehlo")) > 1000

    call, params2 = export_lib.load(path, params)
    rng = np.random.default_rng(0)
    st = jnp.asarray(rng.normal(size=(1, 9, 2)), jnp.float32)
    hp = jnp.asarray(rng.normal(size=(1, 50, 4, 5)) * 0.5, jnp.float32)
    times_e, tokens_e = call(params2, st, hp)
    times_d, tokens_d = net.apply(params, st, hp)
    np.testing.assert_allclose(np.asarray(times_e), np.asarray(times_d),
                               rtol=1e-5, atol=1e-6)


def test_pcd_roundtrip_and_crop(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 30, size=(2000, 3)) * np.array([1, 1, 0.15])
    path = str(tmp_path / "map.pcd")
    pcd.write_pcd(path, pts)
    back = pcd.read_pcd(path)
    np.testing.assert_allclose(back, pts, atol=1e-5)

    crops = pcd.crop_segments(pts, extent=(25, 25, 5), stride=(5, 5),
                              min_points=100)
    assert len(crops) >= 1
    for c in crops:
        assert len(c["points"]) >= 100
        assert np.all(c["points"] >= -1e-9)
        assert np.all(c["points"][:, :2] <= 25 + 1e-9)


def test_timing_phases(tmp_path):
    t = timing.PhaseTimer()
    with t.phase("path_corridor"):
        pass
    with t.phase("inference"):
        pass
    with t.phase("qp_fill_solve"):
        pass
    s = t.summary()
    assert set(s) == {"path_corridor", "inference", "qp_fill_solve"}
    t.dump(str(tmp_path / "timing.jsonl"))
    rec = json.loads(open(tmp_path / "timing.jsonl").read())
    assert rec["inference"]["count"] == 1

    f = jax.jit(lambda x: x * 2)
    dt = timing.microbenchmark(f, jnp.ones(8))
    assert dt > 0


def test_control_horizon():
    cfg = QPConfig(res=10)
    sc = scenarios.random_scenarios(cfg, 2, seed=63, min_seg=2)
    data = qp.build_qp(cfg, jnp.asarray(sc.state), jnp.asarray(sc.hpolys),
                       jnp.asarray(sc.times), jnp.asarray(sc.seg))
    sol = admm.solve_qp(data, SolverConfig())
    traj = trajectory.from_solution(sol.coeffs, jnp.asarray(sc.times),
                                    jnp.asarray(sc.seg))
    cs = control.control_horizon(traj, PhysParams(), rate_hz=100.0,
                                 horizon_s=0.5)
    assert cs.pos.shape == (2, 50, 3)
    assert cs.thrust.shape == (2, 50)
    assert bool(jnp.all(jnp.isfinite(cs.thrust)))
    # hover-ish start (rest-to-rest): thrust near m*g at t=0
    mg = PhysParams().vehicle_mass * PhysParams().grav_acc
    np.testing.assert_allclose(np.asarray(cs.thrust)[:, 0], mg, rtol=0.2)
    assert np.all(np.asarray(cs.tilt)[:, 0] < 0.2)


def test_ablation_preset():
    assert ABLATION_SUPERVISED.w1 == 0.0
    assert ABLATION_SUPERVISED.wt == 1.0
    assert ABLATION_SUPERVISED.wc == 0.0
    assert ABLATION_SUPERVISED.wp == 0.0


def test_cli_help_and_datagen(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/allocnet.py", "--help"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), env=env)
    assert out.returncode == 0
    assert "datagen" in out.stdout


def test_replan_export_roundtrip(tmp_path):
    """The full net+QP replan step serializes to StableHLO and reproduces
    the in-process result."""
    from allocnet_tpu.config import AllocNetConfig
    from allocnet_tpu.models import export as export_lib
    from allocnet_tpu.planner import replan
    from allocnet_tpu.utils import scenarios as sc_lib

    cfg = AllocNetConfig(qp=QPConfig(res=5),
                         solver=SolverConfig(n_chunks=1, iters_per_chunk=30))
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=16, token_thresh=0.42)
    sc = sc_lib.random_scenarios(cfg.qp, 1, seed=91, min_seg=2)
    st = jnp.asarray(sc.state, jnp.float32)
    hp = jnp.asarray(sc.hpolys, jnp.float32)
    seg = jnp.asarray(sc.seg, jnp.int32)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 9, 2), jnp.float32),
                      jnp.zeros((1, 50, 4, 5), jnp.float32))
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)

    path = str(tmp_path / "replan")
    export_lib.save_replan(path, net, params, cfg, batch=1)
    assert os.path.getsize(os.path.join(path, "replan.stablehlo")) > 10_000

    call, params2 = export_lib.load_replan(path, params)
    prev = replan.init_state(1, cfg)
    # compare jitted-vs-exported (identical programs); an eager reference
    # differs at f32 fusion level on ill-conditioned random-net scenarios
    ref = jax.jit(lambda *a: replan.replan_step(net, params, cfg, *a[:3],
                                                replan.ReplanState(a[3], a[4])))(
        st, hp, seg, prev.coeffs, prev.have_prev)
    got = call(params2, st, hp, seg, prev.coeffs, prev.have_prev)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-6)   # network times
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
    # the random-net scenario's QP is typically unsolved — its clipped
    # iterate is chaotic across program partitionings, so only check shape
    # and finiteness of the coefficients
    assert np.asarray(got[1]).shape == np.asarray(ref[1]).shape
    assert np.all(np.isfinite(np.asarray(got[1])))
