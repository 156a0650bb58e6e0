"""Receding-horizon driver: N clocked ticks with a goal change mid-run.

The reference has no equivalent loop (it replans only on goal clicks,
learning_planning.cpp:143-188); this covers the framework's 10 Hz
replanning driver (planner/driver.py) end to end on CPU.

The time provider here is a deterministic stub emitting generous per-segment
times (the certified-supervision regime of train/datagen.py): the driver is
time-provider-agnostic, and the learned net's calibration is covered by the
training/eval suite -- this test isolates the LOOP mechanics (cold/warm
budget split, corridor trimming, state advance, goal change, telemetry)."""

import numpy as np
import jax
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig, QPConfig, SolverConfig
from allocnet_tpu.planner import driver as driver_lib
from allocnet_tpu.planner import planner as planner_lib


class ConstTimeNet:
    """Stub time-allocation net: params['t'] seconds per segment."""

    def apply(self, params, packed_state, packed_hpolys):
        B = packed_state.shape[0]
        S = int(params["S"])
        t = jnp.full((B, S), params["t"], jnp.float32)
        return t, jnp.ones((B, S), jnp.float32)


def _pillar_map(seed=2):
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(3):
        c = rng.uniform([6, 6, 0], [14, 14, 0], size=3)
        for zz in np.linspace(0, 4, 20):
            ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
            pts.append(np.stack([c[0] + 0.3 * np.cos(ang),
                                 c[1] + 0.3 * np.sin(ang),
                                 np.full(8, zz)], axis=1))
    return np.concatenate(pts)


def test_driver_ticks_with_goal_change():
    # certification-grade budget (config.CERTIFY_SOLVER): random synthetic
    # corridors are hard for the deploy budget (~40% solve rate on the
    # measured hard batch) and this test needs a reliably-solving scenario
    # plain-RRT front-end: this test isolates LOOP mechanics on a benign
    # scenario (see docstring note below).  The RRT*-preferred route for
    # seed 5 crosses a corridor whose QP sits beyond the f32 ADMM's
    # convergence on this map — a solver-tail property tracked in
    # ROADMAP.md, not a loop property.
    from allocnet_tpu.config import CorridorConfig
    cfg = AllocNetConfig(qp=QPConfig(res=10),
                         solver=SolverConfig(n_chunks=4, polish_rounds=6,
                                             iters_per_chunk=250),
                         corridor=CorridorConfig(use_rrt_star=False))
    pts = _pillar_map()
    pmap = planner_lib.build_map(pts, [0, 0, 0], [20, 20, 4], scale=0.25,
                                 dilate_r=2)

    # 5 s/segment keeps peak speed well under the box limit: shorter times
    # make the optimum RIDE the velocity bound across consecutive samples
    # (degenerate duals, ADMM stall) -- the same reason datagen certifies
    # with 2.2x quintic-bound slack
    net = ConstTimeNet()
    params = {"t": jnp.asarray(5.0), "S": cfg.qp.max_seg}

    # open-space routes (pillars live in [6,14]^2): replanning from a state
    # advanced along a wall-hugging trajectory is geometrically infeasible at
    # sampled constraint resolution, which is a property of the scenario, not
    # of the loop under test
    start = np.array([2.0, 3.0, 2.0])
    goal1 = np.array([18.0, 3.0, 2.0])
    goal2 = np.array([18.0, 17.0, 2.0])

    cp1 = planner_lib.plan_corridor(pmap, start, goal1, cfg, seed=3)
    assert cp1.ok, cp1.reason

    drv = driver_lib.Driver(net, params, cfg, rate_hz=10.0)
    st = drv.reset(start, cp1.route[-1], cp1.hpolys, cp1.seg)

    # phase 1: 5 ticks toward goal1 (tick 0 is the cold full-budget plan)
    st, res1 = drv.run(st, 5)
    solved1 = [r.solved for r in res1]
    assert solved1[0], "cold first plan must solve"
    assert any(solved1[1:]), solved1
    d0 = np.linalg.norm(start - goal1)
    assert np.linalg.norm(st.pos - goal1) < d0          # progressed
    assert np.all(np.isfinite(st.pos)) and np.all(np.isfinite(st.vel))
    assert bool(np.asarray(st.prev.have_prev)[0])       # warm start armed

    # mid-run goal change: corridor from the CURRENT position to goal2
    cp2 = planner_lib.plan_corridor(pmap, st.pos, goal2, cfg, seed=5)
    assert cp2.ok, cp2.reason
    st = drv.set_goal(st, cp2.route[-1], cp2.hpolys, cp2.seg)
    assert not bool(np.asarray(st.prev.have_prev)[0])   # warm start dropped

    pos_before = st.pos.copy()
    st, res2 = drv.run(st, 5)
    assert any(r.solved for r in res2)
    # moving toward goal2 now
    assert (np.linalg.norm(st.pos - goal2)
            < np.linalg.norm(pos_before - goal2))

    # telemetry tick: control horizon shapes + physical sanity
    r = drv.tick(st, telemetry=True)
    if r.solved:
        tel = r.telemetry
        assert tel.thrust.shape == (1, 100)             # 1 kHz x 0.1 s
        assert np.all(np.asarray(tel.thrust) > 0)
        assert np.all(np.asarray(tel.speed) <= cfg.qp.max_vel * 1.2)


def test_trim_passed():
    # corridor of two unit boxes sharing the x in [0.8, 1.2] slab
    def box(x0, x1):
        return np.array([[1, 0, 0, x1], [-1, 0, 0, -x0],
                         [0, 1, 0, 1.0], [0, -1, 0, 1.0],
                         [0, 0, 1, 1.0], [0, 0, -1, 1.0]], np.float64)
    S, F = 5, 8
    hp = np.zeros((S, F, 4))
    hp[0, :6] = box(0.0, 1.2)
    hp[1, :6] = box(0.8, 2.0)
    out, seg = driver_lib.trim_passed(hp, 2, np.array([0.5, 0.0, 0.5]))
    assert seg == 2                                      # still in poly 0
    out, seg = driver_lib.trim_passed(hp, 2, np.array([1.5, 0.0, 0.5]))
    assert seg == 1                                      # passed into poly 1
    np.testing.assert_allclose(out[0], hp[1])
    assert np.all(out[1:] == 0)


def test_driver_aot_roundtrip(tmp_path):
    """save_aot -> fresh Driver(aot_path=...) must load the serialized
    executables (no tracing/compiling) and produce the SAME tick results as
    the jit path — the deployment fast-start artifact (VERDICT r4 #1)."""
    from allocnet_tpu.config import CorridorConfig
    cfg = AllocNetConfig(qp=QPConfig(res=10),
                         solver=SolverConfig(n_chunks=4, polish_rounds=6,
                                             iters_per_chunk=250),
                         corridor=CorridorConfig(use_rrt_star=False))
    net = ConstTimeNet()
    params = {"t": jnp.asarray(5.0), "S": cfg.qp.max_seg}

    drv = driver_lib.Driver(net, params, cfg, rate_hz=10.0)
    path = str(tmp_path / "aot")
    sizes = drv.save_aot(path)
    assert set(sizes) == {"cold", "tick"}

    drv2 = driver_lib.Driver(net, params, cfg, rate_hz=10.0, aot_path=path)
    assert drv2.aot_loaded
    drv2.prewarm()                      # executes, never compiles

    # identical mission through both drivers: bitwise-equal programs
    pts = _pillar_map()
    pmap = planner_lib.build_map(pts, [0, 0, 0], [20, 20, 4], scale=0.25,
                                 dilate_r=2)
    start = np.array([2.0, 3.0, 2.0])
    cp = planner_lib.plan_corridor(pmap, start, np.array([18.0, 3.0, 2.0]),
                                   cfg, seed=3)
    assert cp.ok, cp.reason
    st_a = drv.reset(start, cp.route[-1], cp.hpolys, cp.seg)
    st_b = drv2.reset(start, cp.route[-1], cp.hpolys, cp.seg)
    st_a, res_a = drv.run(st_a, 3)
    st_b, res_b = drv2.run(st_b, 3)
    assert [r.solved for r in res_a] == [r.solved for r in res_b]
    np.testing.assert_allclose(st_a.pos, st_b.pos, atol=1e-6)

    # a different checkpoint must REJECT the artifact (manifest digest)
    params2 = {"t": jnp.asarray(4.0), "S": cfg.qp.max_seg}
    drv3 = driver_lib.Driver(net, params2, cfg, rate_hz=10.0, aot_path=path)
    assert not drv3.aot_loaded


def test_plan_cold_pipelined_matches_split_path(tmp_path):
    """planner.plan_cold_pipelined (speculative corridor-kernel -> cold-tick
    chain, zero intermediate syncs) must produce the same corridor and the
    same cold-tick decision as plan_corridor + a manual cold tick."""
    from allocnet_tpu.config import CorridorConfig
    cfg = AllocNetConfig(qp=QPConfig(res=10),
                         solver=SolverConfig(n_chunks=4, polish_rounds=6,
                                             iters_per_chunk=250),
                         corridor=CorridorConfig(use_rrt_star=False))
    net = ConstTimeNet()
    params = {"t": jnp.asarray(5.0), "S": cfg.qp.max_seg}
    pts = _pillar_map()
    pmap = planner_lib.build_map(pts, [0, 0, 0], [20, 20, 4], scale=0.25,
                                 dilate_r=2)
    start = np.array([2.0, 3.0, 2.0])
    goal = np.array([18.0, 3.0, 2.0])

    cold = driver_lib.make_cold_tick(net, cfg, params, rate_hz=10.0)
    ok, reason, route, hp, seg, solved, plan_c, times, adv = \
        planner_lib.plan_cold_pipelined(pmap, start, goal, cfg, cold, seed=3)
    assert ok, reason
    assert solved

    cp = planner_lib.plan_corridor(pmap, start, goal, cfg, seed=3)
    assert cp.ok
    assert seg == cp.seg
    np.testing.assert_allclose(hp, np.asarray(cp.hpolys, hp.dtype), atol=1e-6)
    np.testing.assert_allclose(route[-1], cp.route[-1], atol=1e-6)

    st9 = np.zeros((1, 2, 3, 3), np.float32)
    st9[0, 0, :, 0] = start
    st9[0, 1, :, 0] = cp.route[-1]
    solved2, plan2, times2, _ = cold(
        jnp.asarray(st9), jnp.asarray(cp.hpolys, jnp.float32)[None],
        jnp.asarray([cp.seg], jnp.int32))
    assert bool(np.asarray(solved2)[0]) == solved
    np.testing.assert_allclose(times, np.asarray(times2), atol=1e-5)
