"""seq10 deployment flow end-to-end: map -> RRT -> corridor that actually
needs 6-10 segments -> imported seq10 network -> 10-segment QP -> trajectory.

Mirrors the 5-segment flow of tests/test_planner.py::test_plan_many_end_to_end
at the reference's ModelMaxSeg=10 operating point (learning_planner.hpp:33,
models/seq10_rest2rest.pt)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allocnet_tpu.config import AllocNetConfig, ModelConfig, QPConfig, \
    SolverConfig

pytestmark = pytest.mark.slow     # maze map + S=10 QP batch: ~1.5 min
from allocnet_tpu.planner import planner as planner_lib
from allocnet_tpu.planner import trajectory as traj_lib


def _maze_map():
    """Three full-height walls with alternating gaps: the route MUST snake
    through them, so the shortcut corridor genuinely keeps > 5 polytopes
    (random pillar clutter shortcuts down to 4-5)."""
    pts = []
    ys = np.arange(0.0, 20.0, 0.25)
    zs = np.linspace(0.0, 4.0, 16)
    for xw, gap in [(10.0, (2.0, 5.0)), (20.0, (15.0, 18.0)),
                    (30.0, (2.0, 5.0))]:
        yy = ys[(ys < gap[0]) | (ys > gap[1])]
        g = np.stack(np.meshgrid(yy, zs, indexing="ij"), axis=-1)
        wall = np.concatenate([np.full((*g.shape[:2], 1), xw),
                               g], axis=-1).reshape(-1, 3)
        pts.append(wall)
    return np.concatenate(pts)


def test_seq10_plan_end_to_end():
    from allocnet_tpu.models import import_torch
    from allocnet_tpu.models.networks import ConvLSTMAllocNet

    pts = _maze_map()
    # generous box limits: the imported seq10 net is out-of-distribution on
    # synthetic maps; the flow under test is corridor->net->QP->trajectory.
    from allocnet_tpu.config import CorridorConfig
    cfg = AllocNetConfig(
        qp=QPConfig(res=10, max_seg=10, max_vel=8.0, max_acc=12.0),
        solver=SolverConfig(n_chunks=2, iters_per_chunk=150),
        model=ModelConfig(seq_len=10),
        # plain-RRT front-end: this test pins the corridor geometry the
        # OOD seq10 net's time predictions are known-feasible on.  The
        # Informed-RRT* default hugs the maze walls, and plan_many
        # mirrors the reference plan()'s fail-on-QP-reject semantics
        # (learning_planner.hpp:181-189) — hedged time-stretch rescue is
        # the DRIVER's job (driver._cold_tick), tested in test_driver.py.
        corridor=CorridorConfig(use_rrt_star=False),
    )
    pmap = planner_lib.build_map(pts, [0, 0, 0], [40, 20, 4], scale=0.25,
                                 dilate_r=2)

    net = ConvLSTMAllocNet(seq_len=10, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(jnp.asarray, import_torch.load_torchscript_lstm(
        "/root/reference/src/planner/models/seq10_rest2rest.pt"))

    starts = np.array([[2.0, 10.0, 2.0], [2.0, 17.0, 2.0]])
    goals = np.array([[38.0, 10.0, 2.0], [38.0, 3.0, 2.0]])
    out = planner_lib.plan_many(pmap, starts, goals, net, params, cfg)

    assert out.corridor_ok.any(), out.reasons
    # the long map must exercise the seq10-only regime: at least one plan's
    # corridor has more than 5 segments (i.e., impossible at ModelMaxSeg=5)
    segs = np.asarray(out.traj.seg_mask.sum(-1)).astype(int)
    assert (segs[out.corridor_ok] > 5).any(), (segs, out.reasons)

    # QP solved on a >5-segment corridor and the trajectory is dynamically
    # sane: finite samples, correct endpoints, velocity under the box limit
    ok = out.corridor_ok & np.asarray(out.result.solved)
    long_ok = ok & (segs > 5)
    assert long_ok.any(), (segs, np.asarray(out.result.solved), out.reasons)
    b = int(np.where(long_ok)[0][0])

    one = jax.tree.map(lambda a: jnp.asarray(a)[b:b + 1], out.traj)
    _, states = traj_lib.sample(one, n=64)
    p = np.asarray(states)[0, :, 0]                     # (n, 3) positions
    assert np.all(np.isfinite(np.asarray(states)))
    np.testing.assert_allclose(p[0], starts[b], atol=1e-2)
    v = np.linalg.norm(np.asarray(states)[0, :, 1], axis=-1)
    assert v.max() <= cfg.qp.max_vel * 1.2
    # reference semantics: the end state is the route's last point
    # (learning_planner.hpp:264), within the box-corner tolerance
    vmax, amax = traj_lib.max_rates(one)
    assert float(vmax[0]) <= cfg.qp.max_vel * 1.2
    assert float(amax[0]) <= cfg.qp.max_acc * 1.2


def test_default_frontend_e2e_with_in_distribution_net():
    """ADVICE r4: the ONLY e2e test pinned use_rrt_star=False, leaving the
    deployed Informed-RRT* default uncovered through corridor->net->QP.
    This companion keeps the default front-end and uses the repo's own
    in-distribution flagship checkpoint (runs/big4, trained on
    random_obstacle_map clutter at res=10, v<=5, a<=7)."""
    from allocnet_tpu.models.networks import ConvLSTMAllocNet
    from allocnet_tpu.planner import native
    from allocnet_tpu.train import datagen, trainer as trainer_lib
    from allocnet_tpu.train import train_step as ts_lib
    from allocnet_tpu.config import TrainConfig

    if not native.available():
        pytest.skip("native runtime not built (Informed RRT* front-end)")

    cfg = AllocNetConfig(
        qp=QPConfig(res=10, max_vel=5.0, max_acc=7.0),
        solver=SolverConfig(n_chunks=4, iters_per_chunk=250,
                            polish_rounds=4),
        model=ModelConfig(hidden_size=256, token_thresh=0.42),
    )
    assert cfg.corridor.use_rrt_star          # the deployed default
    pts = datagen.random_obstacle_map(77)
    pmap = planner_lib.build_map(pts, [0, 0, 0], [20, 20, 4], scale=0.25,
                                 dilate_r=2)
    assert pmap.native is not None

    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.42)
    s0 = jnp.zeros((1, 2, 3, 3), jnp.float32)
    h0 = jnp.zeros((1, 5, 50, 4), jnp.float32)
    template = ts_lib.init_state(net, TrainConfig(), s0, h0)
    ck = trainer_lib.latest_checkpoint("runs/big4/checkpoints")
    assert ck, "committed flagship checkpoint missing"
    ts, _ = trainer_lib.restore_checkpoint(ck, template)

    starts = np.array([[1.5, 1.5, 1.5], [2.0, 18.0, 2.0], [1.0, 10.0, 1.0]])
    goals = np.array([[18.5, 18.0, 2.0], [18.0, 2.0, 1.5], [19.0, 10.0, 2.5]])
    out = planner_lib.plan_many(pmap, starts, goals, net, ts.params, cfg,
                                seed=5)
    assert out.corridor_ok.any(), out.reasons
    solved = out.corridor_ok & np.asarray(out.result.solved)
    assert solved.any(), (out.reasons, np.asarray(out.result.solved))
    assert np.all(np.isfinite(np.asarray(out.traj.coeffs)))
