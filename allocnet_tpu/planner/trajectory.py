"""Batched piecewise-polynomial trajectory evaluation.

TPU-native equivalent of the reference's Piece/Trajectory templates
(trajectory.hpp:37-645) and the Python mirror (network/utils/trajectory.py):
fixed-shape, masked, vmap/jit-friendly.  Coefficients are stored
highest-degree-first per (segment, axis), exactly the reference layout
(trajectory.hpp:75-85).

Max-rate checks: the reference isolates polynomial roots (root_finder.hpp,
trajectory.hpp:177-315).  Sequential root isolation is a poor fit for the
VPU; we instead evaluate derivatives on a dense tau grid per segment (a
single batched matmul) — with enough samples this bounds the max rate to any
needed tolerance, and it vectorizes over thousands of trajectories.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.ops import bases


class Trajectory(NamedTuple):
    """Batch of piecewise-polynomial trajectories.

    coeffs: (B, S, 3, D) physical coefficients, highest-degree-first
    times:  (B, S) segment durations (padding arbitrary)
    seg_mask: (B, S) 1.0 for active segments
    """

    coeffs: jax.Array
    times: jax.Array
    seg_mask: jax.Array

    @property
    def total_time(self) -> jax.Array:
        return jnp.sum(self.times * self.seg_mask, axis=-1)


def from_solution(coeffs: jax.Array, times: jax.Array, seg: jax.Array) -> Trajectory:
    S = times.shape[-1]
    mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(times.dtype)
    return Trajectory(coeffs=coeffs, times=times * mask, seg_mask=mask)


def _locate(traj: Trajectory, t: jax.Array):
    """Global time -> (segment index, local time), reference
    trajectory.hpp:518-543 (locatePieceIdx).  t: (B,)."""
    dt = traj.times * traj.seg_mask
    cum = jnp.cumsum(dt, axis=-1)                      # (B, S)
    start = cum - dt
    t_clip = jnp.clip(t, 0.0, cum[:, -1])
    # last active segment whose start <= t
    idx = jnp.sum(((start <= t_clip[:, None]) & (traj.seg_mask > 0)).astype(jnp.int32),
                  axis=-1) - 1
    idx = jnp.clip(idx, 0, dt.shape[-1] - 1)
    local = t_clip - jnp.take_along_axis(start, idx[:, None], axis=1)[:, 0]
    return idx, local


def _powers(D: int, t: jax.Array) -> jax.Array:
    """(..., D) row of t^{D-1}, ..., t, 1."""
    e = jnp.arange(D - 1, -1, -1)
    return t[..., None] ** e


def _deriv_row(D: int, r: int, t: jax.Array) -> jax.Array:
    rows = []
    for k in range(D):
        deg = D - 1 - k
        if deg >= r:
            f = bases.falling_factorial(deg, r)
            rows.append(f * t ** (deg - r))
        else:
            rows.append(jnp.zeros_like(t))
    return jnp.stack(rows, axis=-1)


def eval_state(traj: Trajectory, t: jax.Array, max_deriv: int = 3) -> jax.Array:
    """Evaluate (pos, vel, acc, ...) at global times t (B,).

    Returns (B, max_deriv+1, 3): derivative levels 0..max_deriv per axis.
    """
    D = traj.coeffs.shape[-1]
    idx, local = _locate(traj, t)
    c = traj.coeffs[jnp.arange(t.shape[0]), idx]     # (B, 3, D)
    rows = jnp.stack([_deriv_row(D, r, local) for r in range(max_deriv + 1)],
                     axis=1)                                      # (B, R, D)
    return jnp.einsum('brd,bjd->brj', rows, c)


def sample(traj: Trajectory, n: int, max_deriv: int = 2) -> tuple[jax.Array, jax.Array]:
    """Uniformly sample n points over [0, total_time].

    Returns (t (B, n), states (B, n, max_deriv+1, 3))."""
    B = traj.coeffs.shape[0]
    frac = jnp.linspace(0.0, 1.0, n)
    t = traj.total_time[:, None] * frac[None, :]
    flat_t = t.reshape(-1)
    rep = jax.tree.map(lambda a: jnp.repeat(a, n, axis=0), traj)
    states = eval_state(rep, flat_t, max_deriv)
    return t, states.reshape(B, n, max_deriv + 1, 3)


def max_rates(traj: Trajectory, samples_per_seg: int = 64) -> tuple[jax.Array, jax.Array]:
    """(max |vel| rate, max |acc| rate) per trajectory via dense tau sampling
    (replaces root-counting checkMaxVelRate/checkMaxAccRate,
    trajectory.hpp:275-315). Norm over axes, max over segments and samples."""
    B, S, _, D = traj.coeffs.shape
    taus = np.linspace(0.0, 1.0, samples_per_seg)
    # physical basis rows at t = tau * T: beta_r(tau*T)
    e = jnp.arange(D - 1, -1, -1, dtype=traj.times.dtype)
    t = traj.times[:, :, None] * jnp.asarray(taus)[None, None, :]   # (B,S,N)
    v_rows = _deriv_row(D, 1, t)                                    # (B,S,N,D)
    a_rows = _deriv_row(D, 2, t)
    vel = jnp.einsum('bsnd,bsjd->bsnj', v_rows, traj.coeffs)
    acc = jnp.einsum('bsnd,bsjd->bsnj', a_rows, traj.coeffs)
    vmag = jnp.linalg.norm(vel, axis=-1) * traj.seg_mask[:, :, None]
    amag = jnp.linalg.norm(acc, axis=-1) * traj.seg_mask[:, :, None]
    return jnp.max(vmag, axis=(1, 2)), jnp.max(amag, axis=(1, 2))


def snap_cost(traj: Trajectory, order: int,
              reference_compat: bool = False) -> jax.Array:
    """Analytic integral of the squared order-th derivative (reference
    getTrajCost, trajectory.hpp:354-427), via the unit-interval Gram.
    reference_compat reproduces the reference's m_34 Gram typo (bases.py)."""
    D = traj.coeffs.shape[-1]
    Qh = jnp.asarray(bases.gram_matrix(order, reference_compat=reference_compat),
                     traj.coeffs.dtype)
    # scaled coeffs c' = c * T^deg; cost per segment = T^{-(2o-1)} c'^T Qh c'
    pw = jnp.asarray(bases.unscale_powers(D), traj.coeffs.dtype)
    tsafe = jnp.where(traj.seg_mask > 0, jnp.maximum(traj.times, 1e-6), 1.0)
    cs = traj.coeffs * (tsafe[:, :, None] ** pw)[:, :, None, :]
    per_seg = jnp.einsum('bsjd,de,bsje->bs', cs, Qh, cs)
    w = tsafe ** (-(2 * order - 1))
    return jnp.sum(per_seg * w * traj.seg_mask, axis=-1)
