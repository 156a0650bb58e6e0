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

import math
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
    trajectory.hpp:275-315). Norm over axes, max over segments and samples.
    Einsums pinned to f32 MXU precision: the TPU bf16 default adds ~1e-2
    relative noise to a limit check."""
    with jax.default_matmul_precision('float32'):
        return _max_rates_impl(traj, samples_per_seg)


def _max_rates_impl(traj: Trajectory, samples_per_seg: int):
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


def _deriv_tau_coeffs(traj: Trajectory, r: int) -> jax.Array:
    """Coefficients of d^r p/dt^r composed with t = T_i * tau, ascending
    degree in tau: returns (B, S, 3, D-r) with entry k equal to the tau^k
    coefficient (physical units).  q_k = fall(k+r, r) * c_{k+r} * T^k where
    c is the ascending-degree physical coefficient."""
    B, S, _, D = traj.coeffs.shape
    c_deg = traj.coeffs[..., ::-1]                     # ascending degree
    K = D - r
    fall = np.array([bases.falling_factorial(k + r, r) for k in range(K)])
    tsafe = jnp.where(traj.seg_mask > 0, jnp.maximum(traj.times, 1e-9), 1.0)
    tp = tsafe[:, :, None] ** jnp.arange(K, dtype=traj.coeffs.dtype)[None, None]
    return (c_deg[..., r:] * jnp.asarray(fall, traj.coeffs.dtype)
            * tp[:, :, None, :])


def _mono_to_bernstein(n: int) -> np.ndarray:
    """(n+1, n+1) matrix mapping ascending monomial coeffs on [0,1] to
    Bernstein coefficients: b_j = sum_{k<=j} C(j,k)/C(n,k) a_k."""
    A = np.zeros((n + 1, n + 1))
    for j in range(n + 1):
        for k in range(j + 1):
            A[j, k] = math.comb(j, k) / math.comb(n, k)
    return A


def _bernstein_product(n: int) -> np.ndarray:
    """(2n+1, n+1, n+1) tensor squaring a degree-n Bernstein form:
    (fg)_m = sum_{i+j=m} C(n,i) C(n,j) / C(2n,m) f_i g_j."""
    P = np.zeros((2 * n + 1, n + 1, n + 1))
    for i in range(n + 1):
        for j in range(n + 1):
            P[i + j, i, j] = (math.comb(n, i) * math.comb(n, j)
                              / math.comb(2 * n, i + j))
    return P


def _sq_norm_bernstein(e: jax.Array) -> jax.Array:
    """Bernstein coefficients of |v|^2 on [0,1] from ascending monomial
    derivative coeffs e (..., 3, K).  Numerically float32-safe: the
    monomial->Bernstein conversion happens at degree K-1 where coefficients
    are O(rate), and the squaring is done IN Bernstein space (all-positive
    product tensor) — squaring in monomial space first amplifies the
    alternating-coefficient cancellation by ~2^{2K} and breaks f32."""
    K = e.shape[-1]
    A = jnp.asarray(_mono_to_bernstein(K - 1), e.dtype)
    b1 = jnp.einsum('jk,...xk->...xj', A, e)
    P = jnp.asarray(_bernstein_product(K - 1), e.dtype)
    return jnp.einsum('mij,...xi,...xj->...m', P, b1, b1)


def _subdivision_matrices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """de Casteljau split at 1/2: Bernstein coeffs of the two halves.
    L[j,k] = C(j,k) 2^{-j}; R = reverse-indexed L."""
    L = np.zeros((n + 1, n + 1))
    for j in range(n + 1):
        for k in range(j + 1):
            L[j, k] = math.comb(j, k) * 0.5 ** j
    # right half coeffs: r_j = sum_{k>=j} C(n-j, k-j) 2^{-(n-j)} b_k
    R = np.zeros((n + 1, n + 1))
    for j in range(n + 1):
        for k in range(j, n + 1):
            R[j, k] = math.comb(n - j, k - j) * 0.5 ** (n - j)
    return L, R


def certified_max_rates(traj: Trajectory, levels: int = 3
                        ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """CERTIFIED bounds on max |vel| and max |acc| over the trajectory.

    The reference certifies rates by real-root isolation on the derivative
    polynomials (trajectory.hpp:177-315, root_finder.hpp:1014) — exact but
    inherently sequential.  The TPU-native certificate instead bounds the
    squared-rate polynomial by its Bernstein coefficients (convex-hull
    property: min_j b_j <= p(tau) <= max_j b_j on [0,1]), tightened by
    `levels` rounds of de Casteljau bisection — everything is a constant
    matrix applied batched over (B, S) segments, and the bound converges
    quadratically in the subdivision width.  Unlike dense sampling
    (max_rates), the upper bound can never miss an inter-sample violation.

    Returns (vel_ub, vel_lb, acc_ub, acc_lb): per-trajectory upper/lower
    bounds with max|rate| guaranteed inside [lb, ub] (lb is attained at an
    interval endpoint, so it is also a valid sampled max).

    Precision contract: the sandwich is exact in exact arithmetic; in
    float32 the tau-composition powers T^k add evaluation noise of order
    1e-3 relative (the same noise dense sampling has).  For hard
    certification run in float64 (CPU/x64 — the f64 tests agree with a
    50001-point sampler to 1e-9); on-TPU f32 results should be read with a
    ~1% relative guard band.  All einsums are pinned to full f32 MXU
    precision — the TPU default (bf16 passes) is far too coarse for a
    certificate.
    """
    with jax.default_matmul_precision('float32'):
        return _certified_max_rates_impl(traj, levels)


def _certified_max_rates_impl(traj: Trajectory, levels: int):
    dtype = traj.coeffs.dtype

    def bounds(r: int):
        e = _deriv_tau_coeffs(traj, r)          # (B,S,3,K) ascending
        b = _sq_norm_bernstein(e)               # (B,S,2K-1) Bernstein coeffs
        n = b.shape[-1] - 1
        b = b[:, :, None, :]                    # (B,S,1,n+1) intervals axis
        L, R = (jnp.asarray(m, dtype) for m in _subdivision_matrices(n))
        for _ in range(levels):
            bl = jnp.einsum('jk,bsik->bsij', L, b)
            br = jnp.einsum('jk,bsik->bsij', R, b)
            b = jnp.concatenate([bl, br], axis=2)
        mask = traj.seg_mask[:, :, None, None]
        ub = jnp.max(jnp.where(mask > 0, b, -jnp.inf), axis=(1, 2, 3))
        # endpoint coefficients are exact values -> a certified lower bound
        ends = jnp.maximum(b[..., 0], b[..., -1])
        lb = jnp.max(jnp.where(mask[..., 0] > 0, ends, -jnp.inf), axis=(1, 2))
        return jnp.sqrt(jnp.maximum(ub, 0.0)), jnp.sqrt(jnp.maximum(lb, 0.0))

    vel_ub, vel_lb = bounds(1)
    acc_ub, acc_lb = bounds(2)
    return vel_ub, vel_lb, acc_ub, acc_lb


def certified_axis_rates(traj: Trajectory, levels: int = 4
                         ) -> tuple[jax.Array, jax.Array]:
    """PER-AXIS certified bounds: (max_t,axis |vel_axis|, max_t,axis
    |acc_axis|) per trajectory — upper bounds via the Bernstein hull of the
    derivative polynomials themselves (no squaring), tightened by de
    Casteljau subdivision.

    This is the bound matching the constraint set the QP actually enforces:
    the reference's dynamic limits are PER-AXIS boxes (planner.yaml
    MaxVelBox/MaxAccBox; qp_solver.hpp:255-296 fills +-rows per axis), not
    norm balls.  certified_max_rates (above) bounds the NORM — a strictly
    stronger claim no box-constrained plan promises: a diagonal flight with
    every axis exactly at its limit has norm sqrt(3)x the box."""
    with jax.default_matmul_precision('float32'):
        dtype = traj.coeffs.dtype

        def bound(r: int) -> jax.Array:
            e = _deriv_tau_coeffs(traj, r)          # (B,S,3,K) ascending
            K = e.shape[-1]
            A = jnp.asarray(_mono_to_bernstein(K - 1), dtype)
            b = jnp.einsum('jk,bsxk->bsxj', A, e)[:, :, :, None, :]
            L, R = (jnp.asarray(m, dtype)
                    for m in _subdivision_matrices(K - 1))
            for _ in range(levels):
                bl = jnp.einsum('jk,bsxik->bsxij', L, b)
                br = jnp.einsum('jk,bsxik->bsxij', R, b)
                b = jnp.concatenate([bl, br], axis=3)
            mask = traj.seg_mask[:, :, None, None, None]
            return jnp.max(jnp.where(mask > 0, jnp.abs(b), -jnp.inf),
                           axis=(1, 2, 3, 4))

        return bound(1), bound(2)


def certify_box(traj: Trajectory, max_vel: float, max_acc: float,
                levels: int = 4) -> jax.Array:
    """True certificate that the PER-AXIS box limits |vel_axis| <= max_vel
    and |acc_axis| <= max_acc hold for ALL t (not just at samples) — the
    exact constraint semantics of the corridor QP (qp_solver.hpp:255-296,
    planner.yaml MaxVelBox/MaxAccBox).  Conservative: a True is a proof; a
    False may be a bound-tightness artifact (raise `levels` to refine).
    For a bound on the velocity/acceleration NORM (a stronger claim than
    the QP makes) see certified_max_rates."""
    vel_ub, acc_ub = certified_axis_rates(traj, levels=levels)
    return (vel_ub <= max_vel) & (acc_ub <= max_acc)


def certified_max_rates_host(coeffs: np.ndarray, times: np.ndarray,
                             seg: np.ndarray, levels: int = 4
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Float64 NumPy mirror of `certified_max_rates` (upper bounds only).

    Processes pinned to an f32 accelerator backend (JAX_PLATFORMS=axon has
    no x64) still need hard certificates for committed eval numbers; this
    runs the identical Bernstein/de-Casteljau sandwich on host in float64,
    reusing the same constant-matrix builders.  Returns (vel_ub, acc_ub)
    per trajectory; agreement with the x64 JAX path is tested to 1e-9
    (tests/test_certify.py)."""
    coeffs = np.asarray(coeffs, np.float64)
    times = np.asarray(times, np.float64)
    B, S, _, D = coeffs.shape
    mask = (np.arange(S)[None, :] < np.asarray(seg)[:, None])
    c_deg = coeffs[..., ::-1]                          # ascending degree
    tsafe = np.where(mask, np.maximum(times, 1e-9), 1.0)

    def ub(r: int) -> np.ndarray:
        K = D - r
        fall = np.array([bases.falling_factorial(k + r, r)
                         for k in range(K)], np.float64)
        tp = tsafe[:, :, None] ** np.arange(K)[None, None]
        e = c_deg[..., r:] * fall * tp[:, :, None, :]  # (B,S,3,K)
        A = _mono_to_bernstein(K - 1)
        b1 = np.einsum('jk,bsxk->bsxj', A, e)
        P = _bernstein_product(K - 1)
        b = np.einsum('mij,bsxi,bsxj->bsm', P, b1, b1)[:, :, None, :]
        n = b.shape[-1] - 1
        L, R = _subdivision_matrices(n)
        for _ in range(levels):
            b = np.concatenate([np.einsum('jk,bsik->bsij', L, b),
                                np.einsum('jk,bsik->bsij', R, b)], axis=2)
        hi = np.max(np.where(mask[:, :, None, None], b, -np.inf),
                    axis=(1, 2, 3))
        return np.sqrt(np.maximum(hi, 0.0))

    return ub(1), ub(2)


def certified_axis_rates_host(coeffs: np.ndarray, times: np.ndarray,
                              seg: np.ndarray, levels: int = 4
                              ) -> tuple[np.ndarray, np.ndarray]:
    """Float64 NumPy mirror of `certified_axis_rates` (per-axis bounds)."""
    coeffs = np.asarray(coeffs, np.float64)
    times = np.asarray(times, np.float64)
    B, S, _, D = coeffs.shape
    mask = (np.arange(S)[None, :] < np.asarray(seg)[:, None])
    c_deg = coeffs[..., ::-1]
    tsafe = np.where(mask, np.maximum(times, 1e-9), 1.0)

    def ub(r: int) -> np.ndarray:
        K = D - r
        fall = np.array([bases.falling_factorial(k + r, r)
                         for k in range(K)], np.float64)
        tp = tsafe[:, :, None] ** np.arange(K)[None, None]
        e = c_deg[..., r:] * fall * tp[:, :, None, :]  # (B,S,3,K)
        A = _mono_to_bernstein(K - 1)
        b = np.einsum('jk,bsxk->bsxj', A, e)[:, :, :, None, :]
        L, R = _subdivision_matrices(K - 1)
        for _ in range(levels):
            b = np.concatenate([np.einsum('jk,bsxik->bsxij', L, b),
                                np.einsum('jk,bsxik->bsxij', R, b)], axis=3)
        return np.max(np.where(mask[:, :, None, None, None],
                               np.abs(b), -np.inf), axis=(1, 2, 3, 4))

    return ub(1), ub(2)


def certify_box_host(coeffs: np.ndarray, times: np.ndarray, seg: np.ndarray,
                     max_vel: float, max_acc: float,
                     levels: int = 4) -> np.ndarray:
    """Host-f64 `certify_box`: (B,) bool, True = proof of PER-AXIS box
    feasibility for all t (the QP's constraint semantics, qp_solver.hpp:
    255-296; reference root-isolation analog: trajectory.hpp:177-315)."""
    vel_ub, acc_ub = certified_axis_rates_host(coeffs, times, seg, levels)
    return (vel_ub <= max_vel) & (acc_ub <= max_acc)


def taylor_shift(coeffs: jax.Array, u: jax.Array) -> jax.Array:
    """Re-root polynomials at t = u: returns q with q(s) = p(u + s).

    coeffs: (..., 3, D) highest-degree-first; u: (...) broadcast over the
    leading dims.  This is the exact linear map that turns the remainder of
    a polynomial piece into a fresh piece starting at local time u — the
    receding-horizon driver uses it to convert "the previous plan restricted
    to [u, T]" into a feasible warm start for the next tick's QP (the
    reference has no equivalent; it only ever re-plans from scratch,
    learning_planning.cpp:143-188)."""
    D = coeffs.shape[-1]
    comb = np.array([[math.comb(d, j) if d >= j else 0.0 for d in range(D)]
                     for j in range(D)])
    pows = np.array([[max(d - j, 0) for d in range(D)] for j in range(D)])
    # M[..., j, d] = C(d, j) * u^{d-j}  (degree-indexed, lowest-first)
    M = jnp.asarray(comb, coeffs.dtype) * (
        u[..., None, None] ** jnp.asarray(pows, coeffs.dtype))
    M = M * jnp.asarray(comb > 0, coeffs.dtype)
    c_deg = coeffs[..., ::-1]                       # lowest-degree-first
    q_deg = jnp.einsum('...jd,...xd->...xj', M, c_deg)
    return q_deg[..., ::-1]


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
