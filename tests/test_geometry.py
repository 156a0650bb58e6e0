"""Voxel map, batched LP, MVIE, FIRI behavior tests."""

import jax.numpy as jnp
import numpy as np

from allocnet_tpu.ops import firi as firi_lib
from allocnet_tpu.ops import lp, mvie, voxel


def test_voxelize_dilate_surf():
    pts = jnp.asarray([[5.5, 5.5, 5.5]])
    occ = voxel.voxelize(pts, origin=[0., 0., 0.], size=(11, 11, 11), scale=1.0)
    assert int(occ.sum()) == 1 and bool(occ[5, 5, 5])

    occ1, surf1 = voxel.dilate(occ, 1)
    assert int(occ1.sum()) == 27            # 3x3x3 block
    assert int(surf1.sum()) == 26           # shell excludes center

    occ2, surf2 = voxel.dilate(occ, 2)
    assert int(occ2.sum()) == 125
    assert int(surf2.sum()) == 125 - 27     # second shell only

    grid = voxel.make_grid(pts, [0., 0., 0.], (11, 11, 11), 1.0, dilate_r=1)
    # query: occupied center, free corner, out-of-bounds occupied
    q = voxel.query(grid, jnp.asarray([[5.5, 5.5, 5.5],
                                       [0.2, 0.2, 0.2],
                                       [-3., 0., 0.]]))
    assert q.tolist() == [True, False, True]

    sp = voxel.surf_points_host(grid)
    assert sp.shape == (26, 3)
    np.testing.assert_allclose(np.abs(sp - 5.5).max(), 1.0)


def _box(lo, hi):
    rows = []
    for j in range(3):
        a = np.zeros(3); a[j] = 1.0
        rows.append(np.concatenate([a, [hi[j]]]))
        rows.append(np.concatenate([-a, [-lo[j]]]))
    return np.asarray(rows)


def test_find_interior_and_overlap():
    box = _box([-1, -1, -1], [1, 1, 1])
    hp = jnp.asarray(box)[None]
    mask = jnp.ones((1, 6))
    pt, depth = lp.find_interior(hp, mask)
    np.testing.assert_allclose(np.asarray(pt)[0], 0.0, atol=1e-3)
    np.testing.assert_allclose(float(depth[0]), 1.0, atol=1e-3)

    shifted = jnp.asarray(_box([0.5, 0.5, 0.5], [2.5, 2.5, 2.5]))[None]
    apart = jnp.asarray(_box([3.0, 3.0, 3.0], [5.0, 5.0, 5.0]))[None]
    assert bool(lp.overlap(hp, mask, shifted, mask)[0])
    assert not bool(lp.overlap(hp, mask, apart, mask)[0])

    assert bool(lp.contains(hp[0], mask[0], jnp.asarray([0.2, 0.0, 0.9])))
    assert not bool(lp.contains(hp[0], mask[0], jnp.asarray([1.5, 0.0, 0.0])))


def test_mvie_unit_cube():
    box = _box([-1, -1, -1], [1, 1, 1])
    hp = jnp.asarray(box)[None]
    mask = jnp.ones((1, 6))
    init = mvie.Ellipsoid(R=jnp.eye(3)[None], p=jnp.zeros((1, 3)),
                          r=jnp.full((1, 3), 0.3))
    ell, ok = mvie.max_vol_ellipsoid(hp, mask, init, iters=80)
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(ell.p)[0], 0.0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ell.r)[0], 1.0, rtol=5e-2)


def test_mvie_slab():
    """Anisotropic region: radii must reflect the geometry."""
    box = _box([-4, -2, -0.5], [4, 2, 0.5])
    hp = jnp.asarray(box)[None]
    mask = jnp.ones((1, 6))
    init = mvie.Ellipsoid(R=jnp.eye(3)[None], p=jnp.zeros((1, 3)),
                          r=jnp.full((1, 3), 0.2))
    ell, ok = mvie.max_vol_ellipsoid(hp, mask, init, iters=100)
    r = np.sort(np.asarray(ell.r)[0])
    np.testing.assert_allclose(r, [0.5, 2.0, 4.0], rtol=0.1)


def test_firi_separates_obstacles():
    B = 2
    bd = jnp.asarray(np.stack([_box([-5, -5, -2], [5, 5, 2])] * B))
    obstacles = np.array([
        [[2.0, 0.0, 0.0], [0.0, 2.5, 0.5], [-3.0, 1.0, 0.0],
         [1.5, -2.0, 0.3], [1e6, 1e6, 1e6]],
        [[0.0, 3.0, 0.0], [2.5, 2.5, 0.2], [-2.0, -2.0, -0.4],
         [3.0, -1.0, 0.1], [1e6, 1e6, 1e6]],
    ])
    pc = jnp.asarray(obstacles)
    pc_mask = jnp.asarray([[1, 1, 1, 1, 0], [1, 1, 1, 1, 0]], jnp.float64)
    a = jnp.asarray([[-1.0, 0.0, 0.0]] * B)
    b = jnp.asarray([[1.0, 0.5, 0.0]] * B)

    res = firi_lib.firi(bd, pc, pc_mask, a, b, iterations=2, mvie_iters=40)
    assert bool(res.ok.all())
    hp = np.asarray(res.hpolys)
    mk = np.asarray(res.mask)
    for bi in range(B):
        rows = hp[bi][mk[bi] > 0]
        assert rows.shape[0] >= 4
        # seed endpoints inside
        for s in (np.asarray(a)[bi], np.asarray(b)[bi]):
            assert np.all(rows[:, :3] @ s <= rows[:, 3] + 1e-5)
        # every (real) obstacle point cut off by at least one plane
        for k in range(4):
            p = obstacles[bi, k]
            assert np.max(rows[:, :3] @ p - rows[:, 3]) > -1e-4, (bi, k)


def test_lbfgs_quadratic():
    from allocnet_tpu.ops import lbfgs
    A = np.diag([1.0, 10.0, 100.0])
    b = np.array([1.0, -2.0, 3.0])
    f = lambda x: 0.5 * x @ jnp.asarray(A) @ x - jnp.asarray(b) @ x
    x, fv = lbfgs.minimize(f, jnp.zeros(3), iters=40)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-5)
