"""FIRI — Fast Iterative Region Inflation, batched for TPU.

Re-design of the reference's firi::firi (firi.hpp:267-416): grow a convex
polytope around a seed segment inside a bounding box, separating it from a
local obstacle point cloud, alternating with MVIE (ops/mvie.py).

The reference's inner loop is a sequential greedy plane selection with
data-dependent termination (firi.hpp:349-398).  Here it is a fixed-length
lax.scan over at most `n_planes` picks with masked no-ops after completion —
identical picks in exact arithmetic, but batched over B windows at once.

Conventions: half-spaces are a.x <= b rows ((..., 4) with b in col 3), unlike
the reference's a.x + d <= 0 (the planner's normalization flip,
learning_planner.hpp:293-299, is baked in throughout this framework).
Padded rows/points are zeros with mask arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from allocnet_tpu.ops import mvie


class FiriResult(NamedTuple):
    hpolys: jax.Array     # (B, K, 4) a.x <= b rows, zero padded
    mask: jax.Array       # (B, K)
    ellipsoid: mvie.Ellipsoid
    ok: jax.Array         # (B,) seed endpoints inside the bounding box


def _tangent_planes(pc_f, fa, fb, eps):
    """Per-point separating planes in the forward (ball) frame
    (firi.hpp:303-335): sphere tangent, relaxed toward the seed endpoints
    when they'd be cut off."""
    distR = jnp.linalg.norm(pc_f, axis=-1)
    safe = jnp.maximum(distR, 1e-12)
    n = pc_f / safe[..., None]
    t3 = -distR

    def relax(n, t3, distR, endpoint):
        viol = jnp.einsum('bnj,bj->bn', n, endpoint) + t3 > eps
        delta = pc_f - endpoint[:, None, :]
        dd = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
        proj = endpoint[:, None, :] - (
            jnp.sum(delta * endpoint[:, None, :], axis=-1) / dd)[..., None] * delta
        pnorm = jnp.maximum(jnp.linalg.norm(proj, axis=-1), 1e-12)
        n2 = proj / pnorm[..., None]
        return (jnp.where(viol[..., None], n2, n),
                jnp.where(viol, -pnorm, t3),
                jnp.where(viol, pnorm, distR))

    n, t3, distR = relax(n, t3, distR, fa)
    n, t3, distR = relax(n, t3, distR, fb)

    # final fallback: plane through the point containing both endpoints
    viol = jnp.einsum('bnj,bj->bn', n, fa) + t3 > eps
    cr = jnp.cross(fa[:, None, :] - pc_f, fb[:, None, :] - pc_f)
    crn = cr / jnp.maximum(jnp.linalg.norm(cr, axis=-1), 1e-12)[..., None]
    t3c = -jnp.einsum('bnj,bj->bn', crn, fa)
    flip = jnp.where(t3c > 0.0, -1.0, 1.0)
    n = jnp.where(viol[..., None], crn * flip[..., None], n)
    t3 = jnp.where(viol, t3c * flip, t3)
    return n, t3, distR


def firi(
    bd: jax.Array,        # (B, Mb, 4) bounding rows a.x <= b
    pc: jax.Array,        # (B, N, 3) obstacle points (padded)
    pc_mask: jax.Array,   # (B, N)
    seed_a: jax.Array,    # (B, 3)
    seed_b: jax.Array,    # (B, 3)
    iterations: int = 4,  # firi.hpp:272
    n_planes: int = 50,
    eps: float = 1e-6,
    mvie_iters: int = 60,
) -> FiriResult:
    B, Mb, _ = bd.shape
    N = pc.shape[1]
    dt = bd.dtype

    bd_a = bd[..., :3]
    bd_b = bd[..., 3]

    inside = lambda x: jnp.max(
        jnp.einsum('bmi,bi->bm', bd_a, x) - bd_b, axis=-1) <= 0.0
    ok = inside(seed_a) & inside(seed_b)

    ell = mvie.Ellipsoid(
        R=jnp.broadcast_to(jnp.eye(3, dtype=dt), (B, 3, 3)),
        p=0.5 * (seed_a + seed_b),
        r=jnp.ones((B, 3), dt),
    )

    planes = jnp.zeros((B, n_planes, 4), dt)
    pmask = jnp.zeros((B, n_planes), dt)

    for loop in range(iterations):
        inv_r = 1.0 / jnp.maximum(ell.r, 1e-9)
        forward = inv_r[..., :, None] * jnp.swapaxes(ell.R, -1, -2)
        backward = ell.R * ell.r[..., None, :]

        fwdB = jnp.einsum('bmi,bij->bmj', bd_a, backward)       # (B,Mb,3)
        fwdD = jnp.einsum('bmi,bi->bm', bd_a, ell.p) - bd_b     # a.p - b
        distD = jnp.abs(fwdD) / jnp.maximum(
            jnp.linalg.norm(fwdB, axis=-1), 1e-12)

        pc_f = jnp.einsum('bij,bnj->bni', forward, pc - ell.p[:, None, :])
        fa = jnp.einsum('bij,bj->bi', forward, seed_a - ell.p)
        fb = jnp.einsum('bij,bj->bi', forward, seed_b - ell.p)

        tn, t3, distR = _tangent_planes(pc_f, fa, fb, eps)
        distR = jnp.where(pc_mask > 0, distR, jnp.inf)

        def select(carry, _):
            bdF, pcF, planes_f, nH = carry
            dD = jnp.where(bdF, distD, jnp.inf)
            dR = jnp.where(pcF, distR, jnp.inf)
            iD = jnp.argmin(dD, axis=-1)
            iR = jnp.argmin(dR, axis=-1)
            mD = jnp.take_along_axis(dD, iD[:, None], axis=1)[:, 0]
            mR = jnp.take_along_axis(dR, iR[:, None], axis=1)[:, 0]
            active = jnp.isfinite(jnp.minimum(mD, mR))
            pick_bd = mD < mR

            rows_bd = jnp.concatenate(
                [jnp.take_along_axis(fwdB, iD[:, None, None].repeat(3, 2),
                                     axis=1)[:, 0],
                 jnp.take_along_axis(fwdD, iD[:, None], axis=1)], axis=-1)
            rows_pc = jnp.concatenate(
                [jnp.take_along_axis(tn, iR[:, None, None].repeat(3, 2),
                                     axis=1)[:, 0],
                 jnp.take_along_axis(t3, iR[:, None], axis=1)], axis=-1)
            row = jnp.where(pick_bd[:, None], rows_bd, rows_pc)

            batch = jnp.arange(B)
            planes_f = planes_f.at[batch, nH].set(
                jnp.where(active[:, None], row, planes_f[batch, nH]))

            clear_bd = jax.nn.one_hot(iD, Mb, dtype=bool) & (
                pick_bd & active)[:, None]
            bdF = bdF & ~clear_bd
            clear_pc = jax.nn.one_hot(iR, N, dtype=bool) & (
                (~pick_bd) & active)[:, None]
            pcF = pcF & ~clear_pc
            # filter points already separated by the chosen plane
            sep = (jnp.einsum('bni,bi->bn', pc_f, row[:, :3])
                   + row[:, 3:4] > -eps)
            pcF = pcF & ~(sep & active[:, None])
            nH = nH + active.astype(jnp.int32)
            return (bdF, pcF, planes_f, nH), None

        bdF0 = jnp.ones((B, Mb), bool)
        pcF0 = pc_mask > 0
        planes_f0 = jnp.zeros((B, n_planes, 4), dt)
        (bdF, pcF, planes_f, nH), _ = jax.lax.scan(
            select, (bdF0, pcF0, planes_f0, jnp.zeros((B,), jnp.int32)),
            None, length=n_planes)

        # back-transform to world (firi.hpp:400-405): n_w = n_f @ forward,
        # b_w = -(d_f) + n_w . p
        n_w = jnp.einsum('bki,bij->bkj', planes_f[..., :3], forward)
        b_w = -planes_f[..., 3] + jnp.einsum('bki,bi->bk', n_w, ell.p)
        kidx = jnp.arange(n_planes)[None, :]
        pmask = (kidx < nH[:, None]).astype(dt)
        planes = jnp.concatenate([n_w, b_w[..., None]], axis=-1) * pmask[..., None]

        if loop < iterations - 1:
            ell, _ = mvie.max_vol_ellipsoid(planes, pmask, ell,
                                            iters=mvie_iters)

    return FiriResult(hpolys=planes, mask=pmask, ellipsoid=ell, ok=ok)
