"""Batched pivot-free blocked LDL^T for quasi-definite KKT systems.

The polish step (ops/admm.py) solves the regularized KKT system

    [[P + delta I,  A^T       ],   with  P + delta I  > 0  (n x n)
     [A,            -delta I  ]]          -delta I     < 0  (m x m)

which is QUASI-DEFINITE: for such matrices the LDL^T factorization exists
without any pivoting for every symmetric permutation (Vanderbei 1995,
"Symmetric quasi-definite matrices") — in particular for the natural order
with the positive block first.  That removes the row-pivoting serialization
that makes XLA's batched LU slow on TPU (gathers per elimination step) and
turns the factorization into batched GEMMs on the MXU.

Blocked right-looking schedule (block size NB):
  for each diagonal block k:  unblocked LDL^T of the (NB, NB) block
  panel:  batched triangular solve  L_ik = K_ik L_kk^{-T} D_k^{-1}
  update: trailing GEMM  K_t -= (L_panel * d) @ L_panel^T

float32 note: growth through the tiny P+delta pivots (delta ~ 1e-5) makes
the raw factor ~1e-2 accurate — the same regime as the explicit ADMM
inverse — and the polish's existing iterative-refinement loop restores
full accuracy (admm.polish refines against the UNregularized KKT anyway).

Replaces: the jax.scipy.linalg.lu_factor/lu_solve pair in admm.polish
(reference anchor: OSQP's own polish QDLDL solve, qp_solver.hpp:298-358 is
the call site whose solution quality this preserves).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.lax.linalg import triangular_solve


def _ldl_unblocked(Kb: jax.Array, sign: jax.Array,
                   reg: float) -> tuple[jax.Array, jax.Array]:
    """LDL^T of a (B, NB, NB) symmetric block, no pivoting.

    `sign` (NB,) gives the a-priori pivot sign of each column (+1 for the
    positive-definite block, -1 for the -delta block of a quasi-definite
    matrix); pivots are bumped to at least `reg` in magnitude toward that
    sign (QDLDL-style dynamic regularization) — this bounds element growth
    through near-singular directions; iterative refinement against the true
    matrix absorbs the perturbation.

    Returns (L_unit_lower, d) with the strictly-lower part of L filled,
    unit diagonal implied, d the (B, NB) pivot vector.
    """
    B, NB, _ = Kb.shape
    dtype = Kb.dtype

    def step(j, K):
        dj = K[:, j, j]                                   # (B,)
        # bump only SMALL pivots toward their expected sign (QDLDL-style);
        # a large pivot is kept even if rounding flipped its sign — replacing
        # it by +/-reg would divide large entries by a tiny number and
        # cascade to overflow.
        dj = jnp.where(jnp.abs(dj) >= reg, dj, sign[j] * reg)
        inv = 1.0 / dj
        col = K[:, :, j] * inv[:, None]                   # (B, NB) = L[:, j]
        mask = (jnp.arange(NB) > j).astype(dtype)         # rows below j
        lcol = col * mask[None, :]
        # trailing update: K -= d_j * l l^T  (only affects rows/cols > j,
        # masked so earlier columns — already final — are untouched)
        K = K - dj[:, None, None] * lcol[:, :, None] * lcol[:, None, :]
        # write the final column j of L into K's lower triangle
        K = K.at[:, :, j].set(jnp.where(mask[None, :] > 0, col, K[:, :, j]))
        return K

    K = jax.lax.fori_loop(0, NB, step, Kb)
    d = jnp.diagonal(K, axis1=1, axis2=2)
    L = jnp.tril(K, -1) + jnp.eye(NB, dtype=dtype)
    return L, d


def ldl_factor(K: jax.Array, nb: int = 64, n_pos: int | None = None,
               reg: float = 1e-6,
               sign: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Blocked LDL^T of (B, N, N); N must be a multiple of nb (pad with
    identity rows/cols to round up — the solve ignores padding if the RHS is
    zero there).  Expected pivot signs either via `n_pos` (= size of the
    leading positive block, rest negative) or an explicit `sign` vector (N,)
    of +/-1 — needed when the caller permutes a quasi-definite matrix so the
    positive block is no longer contiguous.  Returns (L, d): L unit lower
    (B, N, N), d (B, N)."""
    B, N, _ = K.shape
    assert N % nb == 0, (N, nb)
    nblk = N // nb
    dtype = K.dtype
    if sign is None:
        if n_pos is None:
            n_pos = N
        sign = jnp.where(jnp.arange(N) < n_pos, 1.0, -1.0)
    sign = jnp.asarray(sign, dtype)
    if sign.shape[0] < N:   # padding columns: positive identity
        sign = jnp.concatenate(
            [sign, jnp.ones((N - sign.shape[0],), dtype)])

    L = jnp.zeros_like(K)
    d = jnp.zeros((B, N), dtype)

    for kb in range(nblk):
        s = kb * nb
        Kkk = K[:, s:s + nb, s:s + nb]
        Lkk, dk = _ldl_unblocked(Kkk, sign[s:s + nb], reg)
        L = L.at[:, s:s + nb, s:s + nb].set(Lkk)
        d = d.at[:, s:s + nb].set(dk)
        if kb + 1 < nblk:
            rest = slice(s + nb, N)
            # panel: solve  X L_kk^T = K_rest,k  ->  X = K L_kk^{-T}
            panel = triangular_solve(
                Lkk, K[:, rest, s:s + nb],
                left_side=False, lower=True, transpose_a=True)
            dinv = jnp.where(jnp.abs(dk) > 1e-30, 1.0 / dk, 0.0)
            Lpanel = panel * dinv[:, None, :]
            L = L.at[:, rest, s:s + nb].set(Lpanel)
            # trailing symmetric update: K_t -= L_panel D L_panel^T
            upd = jnp.einsum('bik,bjk->bij', Lpanel * dk[:, None, :], Lpanel)
            K = K.at[:, rest, rest].add(-upd)
    return L, d


def ldl_solve(L: jax.Array, d: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve K x = rhs given K = L D L^T; rhs (B, N) -> (B, N)."""
    y = triangular_solve(L, rhs[:, :, None], left_side=True, lower=True,
                         unit_diagonal=True)[:, :, 0]
    dinv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 0.0)
    y = y * dinv
    x = triangular_solve(L, y[:, :, None], left_side=True, lower=True,
                         transpose_a=True, unit_diagonal=True)[:, :, 0]
    return x


def pad_to_block(K: jax.Array, rhs: jax.Array, nb: int = 64):
    """Pad (B, N, N) K with identity and rhs with zeros to a multiple of nb."""
    B, N, _ = K.shape
    Np = ((N + nb - 1) // nb) * nb
    if Np == N:
        return K, rhs, N
    pad = Np - N
    Kp = jnp.zeros((B, Np, Np), K.dtype)
    Kp = Kp.at[:, :N, :N].set(K)
    Kp = Kp.at[:, N:, N:].set(jnp.eye(pad, dtype=K.dtype))
    rp = jnp.zeros((B, Np), rhs.dtype).at[:, :N].set(rhs)
    return Kp, rp, N
