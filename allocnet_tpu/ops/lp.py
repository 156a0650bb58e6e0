"""Batched small dense LP/QP + polytope predicates.

TPU-native replacement for the reference's Seidel LP (sdlp.hpp:708-785, used
for interior points and MVIE seeding) and the geo_utils predicates
(geo_utils.hpp:43-124).  Seidel's randomized recursion is inherently
sequential; for n <= 4 variables with a few hundred rows, a fixed-iteration
ADMM on the regularized problem

    min  eps/2 ||x||^2 + c^T x   s.t.  G x <= h

solves thousands of instances per chip in one program, to the ~1e-5 accuracy
the geometry pipeline needs (membership/clearance decisions, LP seeds).
Padded rows are inert (zero row, h = 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_lp(c: jax.Array, G: jax.Array, h: jax.Array,
             eps: float = 1e-6, rho: float = 1.0, sigma: float = 1e-6,
             alpha: float = 1.6, iters: int = 400):
    """min c.x s.t. Gx <= h, batched over leading dims.

    c: (..., n); G: (..., M, n); h: (..., M).
    Returns (x (..., n), max_violation (...,)).
    """
    n = c.shape[-1]
    dt = c.dtype

    M = (eps + sigma) * jnp.eye(n, dtype=dt) + rho * jnp.einsum(
        '...mi,...mj->...ij', G, G)
    Minv = jnp.linalg.inv(M)

    x = jnp.zeros_like(c)
    z = jnp.minimum(jnp.einsum('...mn,...n->...m', G, x), h)
    y = jnp.zeros_like(h)

    def body(carry, _):
        x, z, y = carry
        rhs = sigma * x - c + jnp.einsum('...mn,...m->...n', G, rho * z - y)
        xt = jnp.einsum('...nm,...m->...n', Minv, rhs)
        zt = jnp.einsum('...mn,...n->...m', G, xt)
        x_new = alpha * xt + (1 - alpha) * x
        v = alpha * zt + (1 - alpha) * z + y / rho
        z_new = jnp.minimum(v, h)
        y_new = jnp.clip((v - z_new) * rho, -1e6, 1e6)
        return (jnp.clip(x_new, -1e6, 1e6), z_new, y_new), None

    (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=iters)
    viol = jnp.max(jnp.maximum(
        jnp.einsum('...mn,...n->...m', G, x) - h, 0.0), axis=-1)
    return x, viol


def _normalize_rows(hpolys: jax.Array, mask: jax.Array):
    """Split padded (.., M, 4) a.x <= b stacks into unit rows + offsets."""
    a = hpolys[..., :3]
    nrm = jnp.linalg.norm(a, axis=-1)
    safe = jnp.maximum(nrm, 1e-9)
    a = a / safe[..., None]
    b = hpolys[..., 3] / safe
    a = a * mask[..., None]
    b = jnp.where(mask > 0, b, 1.0)
    return a, b


def find_interior(hpolys: jax.Array, mask: jax.Array, iters: int = 400):
    """Deepest interior point (Chebyshev-style): max d s.t. a.x + d <= b
    with unit rows (reference findInterior, geo_utils.hpp:43-61).

    hpolys: (..., M, 4) a.x <= b rows (zero padded); mask (..., M).
    Returns (point (..., 3), depth (...,)); interior exists iff depth > 0.
    """
    a, b = _normalize_rows(hpolys, mask)
    G = jnp.concatenate([a, mask[..., None]], axis=-1)       # (..., M, 4)
    c = jnp.zeros(hpolys.shape[:-2] + (4,), hpolys.dtype)
    c = c.at[..., 3].set(-1.0)
    x, _ = solve_lp(c, G, b, iters=iters)
    return x[..., :3], x[..., 3]


def overlap(p1: jax.Array, m1: jax.Array, p2: jax.Array, m2: jax.Array,
            eps: float = 0.01, iters: int = 400):
    """Do two padded polytopes share a point with clearance eps?
    (reference geo_utils::overlap, geo_utils.hpp:64-124; Python
    corridor_generator.py:305-323). Returns bool (...)."""
    hp = jnp.concatenate([p1, p2], axis=-2)
    mk = jnp.concatenate([m1, m2], axis=-1)
    _, depth = find_interior(hp, mk, iters=iters)
    return depth > eps


def contains(hpolys: jax.Array, mask: jax.Array, pts: jax.Array,
             tol: float = 0.01):
    """Point-in-polytope (reference is_in_polyhedron, min_traj_opt.py:235).
    hpolys (..., M, 4), pts (..., 3) -> bool (...)."""
    a = hpolys[..., :3]
    b = hpolys[..., 3]
    v = jnp.einsum('...mi,...i->...m', a, pts) - b
    v = jnp.where(mask > 0, v, -1.0)
    return jnp.max(v, axis=-1) <= tol
