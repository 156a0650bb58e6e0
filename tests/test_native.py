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


def _crop_numpy(points, lo_b, hi_b, n_max):
    """Reference semantics for the window crop (planner/sfc.py fallback)."""
    W = len(lo_b)
    pcs = np.full((W, n_max, 3), 1e9)
    masks = np.zeros((W, n_max))
    for k in range(W):
        if len(points):
            inside = np.all((points > lo_b[k]) & (points < hi_b[k]), axis=1)
            sel = points[inside][:n_max]
            pcs[k, :len(sel)] = sel
            masks[k, :len(sel)] = 1.0
    return pcs, masks


def test_crop_windows_parity():
    if not native.available():
        pytest.skip("native runtime did not build")
    rng = np.random.default_rng(3)
    points = rng.uniform([-5, -5, 0], [25, 25, 5], size=(20000, 3))
    centers = rng.uniform([0, 0, 0], [20, 20, 4], size=(40, 3))
    half = rng.uniform(0.5, 4.0, size=(40, 3))
    lo_b, hi_b = centers - half, centers + half
    for n_max in (2048, 17):     # 17 exercises the truncation order
        got_p, got_m = native.crop_windows(points, lo_b, hi_b, n_max)
        exp_p, exp_m = _crop_numpy(points, lo_b, hi_b, n_max)
        np.testing.assert_array_equal(got_m, exp_m)
        np.testing.assert_array_equal(got_p, exp_p)


def test_crop_windows_edge_cases():
    if not native.available():
        pytest.skip("native runtime did not build")
    # empty cloud
    p, m = native.crop_windows(np.zeros((0, 3)), np.zeros((2, 3)),
                               np.ones((2, 3)), 8)
    assert m.sum() == 0 and np.all(p == 1e9)
    # window entirely outside the cloud's bounds
    pts = np.random.default_rng(0).uniform(0, 1, size=(100, 3))
    p, m = native.crop_windows(pts, np.full((1, 3), 50.0),
                               np.full((1, 3), 60.0), 8)
    assert m.sum() == 0
    # degenerate window (lo >= hi) selects nothing
    p, m = native.crop_windows(pts, np.ones((1, 3)), np.ones((1, 3)), 8)
    assert m.sum() == 0
    # boundary points are STRICTLY outside (matches points < hi, > lo)
    grid_pts = np.array([[0.0, 0.5, 0.5], [1.0, 0.5, 0.5], [0.5, 0.5, 0.5]])
    p, m = native.crop_windows(grid_pts, np.zeros((1, 3)), np.ones((1, 3)), 8)
    assert m[0].sum() == 1 and np.allclose(p[0, 0], [0.5, 0.5, 0.5])
