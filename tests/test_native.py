"""C++ host runtime: build, collision queries, RRT parity with Python."""

import numpy as np
import pytest

from allocnet_tpu.planner import native, rrt


def _pillars(seed=0):
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(6):
        c = rng.uniform([3, 3, 0], [17, 17, 0], size=3)
        for zz in np.linspace(0, 4, 24):
            ang = np.linspace(0, 2 * np.pi, 10, endpoint=False)
            pts.append(np.stack([c[0] + 0.3 * np.cos(ang),
                                 c[1] + 0.3 * np.sin(ang),
                                 np.full(10, zz)], axis=1))
    return np.concatenate(pts)


@pytest.fixture(scope="module")
def grid():
    if not native.available():
        pytest.skip("native runtime did not build")
    pts = _pillars()
    return native.NativeGrid(pts, [0, 0, 0], [20, 20, 4], scale=0.25,
                             safe_dis=0.5), pts


def test_grid_queries(grid):
    g, pts = grid
    assert g.blocked(pts[0])                      # on an obstacle
    assert g.blocked([-1.0, 5.0, 1.0])            # out of bounds
    assert not g.blocked([1.0, 1.0, 1.5])         # free corner


def test_native_rrt_and_simplify(grid):
    g, pts = grid
    start = np.array([1.0, 1.0, 1.5])
    goal = np.array([19.0, 19.0, 2.0])
    path = g.rrt(start, goal, seed=7)
    assert path is not None
    np.testing.assert_allclose(path[0], start)
    np.testing.assert_allclose(path[-1], goal)
    # every edge clear of the dilated grid
    for a, b in zip(path[:-1], path[1:]):
        for t in np.linspace(0, 1, 10):
            assert not g.blocked(a + t * (b - a))
    short = g.simplify(path)
    assert 2 <= len(short) <= len(path)
    for a, b in zip(short[:-1], short[1:]):
        for t in np.linspace(0, 1, 20):
            assert not g.blocked(a + t * (b - a))


def test_native_blocked_start(grid):
    g, pts = grid
    assert g.rrt(pts[0], np.array([19.0, 19.0, 2.0])) is None


def test_native_faster_than_python(grid):
    import time
    g, pts = grid
    start = np.array([1.0, 1.0, 1.5])
    goal = np.array([19.0, 19.0, 2.0])
    t0 = time.time()
    for s in range(3):
        assert g.rrt(start, goal, seed=s) is not None
    t_native = time.time() - t0
    t0 = time.time()
    rrt.plan(start, goal, pts, np.zeros(3), np.array([20., 20., 4.]), seed=0)
    t_py = time.time() - t0
    # not a strict benchmark — just catch accidental pessimization
    assert t_native < t_py * 3
