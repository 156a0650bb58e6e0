"""Maximum-volume inscribed ellipsoid (MVIE), batched.

Re-implementation of the reference's maxVolInsEllipsoid (firi.hpp:163-265):
same smoothed-L1 penalty + log-det objective over the Cholesky-factor
parametrization (costMVIE, firi.hpp:86-157), but optimized with the batched
fixed-shape L-BFGS (ops/lbfgs.py) and jax.grad instead of a hand-coded
gradient, and seeded by the batched LP (ops/lp.py) instead of Seidel.

Ellipsoid: E = { R diag(r) u + p : |u| <= 1 }.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from allocnet_tpu.ops import lbfgs, lp

SMOOTH_EPS = 1e-2     # firi.hpp:215 (*pSmoothEps)
PENALTY_WT = 1e3      # firi.hpp:216 (*pPenaltyWt)


class Ellipsoid(NamedTuple):
    R: jax.Array    # (..., 3, 3) rotation
    p: jax.Array    # (..., 3) center
    r: jax.Array    # (..., 3) radii


def _smoothed_l1(x):
    """smoothedL1 with mu = SMOOTH_EPS (firi.hpp:60-84), zero for x <= 0."""
    mu = SMOOTH_EPS
    xdmu = x / mu
    quad = (mu - 0.5 * x) * xdmu * xdmu * xdmu
    lin = x - 0.5 * mu
    return jnp.where(x <= 0.0, 0.0, jnp.where(x > mu, lin, quad))


def _L_of(params):
    rtd = params[3:6]
    cde = params[6:9]
    eps = jnp.finfo(params.dtype).tiny
    return jnp.array([
        [rtd[0] ** 2 + eps, 0.0, 0.0],
        [cde[0], rtd[1] ** 2 + eps, 0.0],
        [cde[2], cde[1], rtd[2] ** 2 + eps],
    ], params.dtype)


def _cost(params, A, row_mask):
    """costMVIE (firi.hpp:86-157): penalty on ||A L|| + A p - 1, minus
    log det L; rows masked out contribute nothing."""
    p = params[:3]
    L = _L_of(params)
    AL = A @ L
    viola = jnp.linalg.norm(AL, axis=-1) + A @ p - 1.0
    pen = jnp.sum(_smoothed_l1(viola) * row_mask)
    logdet = jnp.sum(jnp.log(jnp.diagonal(L)))
    return PENALTY_WT * pen - logdet


def max_vol_ellipsoid(hpolys: jax.Array, mask: jax.Array, init: Ellipsoid,
                      iters: int = 60, lp_iters: int = 400):
    """Batched MVIE. hpolys (..., M, 4) a.x <= b rows (zero padded).

    Returns (Ellipsoid, ok) with ok = interior point found (depth > 0,
    firi.hpp:178-182)."""
    interior, depth = lp.find_interior(hpolys, mask, iters=lp_iters)
    ok = depth > 0.0

    a, b = lp._normalize_rows(hpolys, mask)
    denom = b - jnp.einsum('...mi,...i->...m', a, interior)
    denom = jnp.where(mask > 0, jnp.maximum(denom, 1e-9), 1.0)
    A = a / denom[..., None]                      # firi.hpp:196-198

    # initial 9-vector from the seed ellipsoid (firi.hpp:200-211)
    Q = jnp.einsum('...ij,...j,...kj->...ik', init.R, init.r ** 2, init.R)
    Lc = jnp.linalg.cholesky(
        Q + 1e-9 * jnp.eye(3, dtype=hpolys.dtype))
    d0 = jnp.sqrt(jnp.maximum(
        jnp.diagonal(Lc, axis1=-2, axis2=-1), 1e-6))
    x0 = jnp.concatenate([
        init.p - interior,
        d0,
        jnp.stack([Lc[..., 1, 0], Lc[..., 2, 1], Lc[..., 2, 0]], axis=-1),
    ], axis=-1)

    batch_shape = hpolys.shape[:-2]
    flatA = A.reshape((-1,) + A.shape[-2:])
    flatM = mask.reshape((-1,) + mask.shape[-1:]).astype(hpolys.dtype)
    flatX = x0.reshape((-1, 9))

    def solve_one(x0_, A_, m_):
        x, f = lbfgs.minimize(lambda v: _cost(v, A_, m_), x0_, iters=iters)
        return x

    xs = jax.vmap(solve_one)(flatX, flatA, flatM).reshape(batch_shape + (9,))

    L = jax.vmap(_L_of)(xs.reshape(-1, 9)).reshape(batch_shape + (3, 3))
    p = xs[..., :3] + interior

    # L = U S V^T; ellipsoid rotation/radii from the left factor
    # (firi.hpp:240-259; determinant sign fixed by column swap)
    U, S, _ = jnp.linalg.svd(L)
    det = jnp.linalg.det(U)
    swap = det < 0.0
    U_fixed = jnp.where(swap[..., None, None],
                        jnp.stack([U[..., :, 1], U[..., :, 0], U[..., :, 2]],
                                  axis=-1), U)
    S_fixed = jnp.where(swap[..., None],
                        jnp.stack([S[..., 1], S[..., 0], S[..., 2]], axis=-1),
                        S)
    return Ellipsoid(R=U_fixed, p=p, r=S_fixed), ok
