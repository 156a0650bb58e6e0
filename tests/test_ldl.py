"""Pivot-free blocked LDL^T vs direct solve on quasi-definite KKT matrices."""

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, ldl, qp
from allocnet_tpu.utils import scenarios


def _qd_kkt(key, B, n, m, delta=1e-5, dtype=jnp.float64):
    """Random quasi-definite KKT: [[P+dI, A^T], [A, -dI]]."""
    k1, k2 = jax.random.split(key)
    W = jax.random.normal(k1, (B, n, n), dtype)
    P = jnp.einsum('bik,bjk->bij', W, W) / n
    # make some P directions tiny (the polish regime: padded/low-weight blocks)
    P = P * 1e-3 + 0.5 * jnp.einsum('bi,bj->bij', W[:, :, 0], W[:, :, 0])
    A = jax.random.normal(k2, (B, m, n), dtype)
    K = jnp.zeros((B, n + m, n + m), dtype)
    K = K.at[:, :n, :n].set(P + delta * jnp.eye(n, dtype=dtype))
    K = K.at[:, :n, n:].set(jnp.swapaxes(A, 1, 2))
    K = K.at[:, n:, :n].set(A)
    K = K.at[:, n:, n:].set(-delta * jnp.eye(m, dtype=dtype))
    return K


def test_ldl_matches_direct_solve_f64():
    key = jax.random.PRNGKey(0)
    B, n, m = 8, 24, 13
    K = _qd_kkt(key, B, n, m)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (B, n + m), jnp.float64)
    Kp, rp, N = ldl.pad_to_block(K, rhs, nb=16)
    L, d = ldl.ldl_factor(Kp, nb=16, n_pos=n, reg=1e-30)
    x = ldl.ldl_solve(L, d, rp)[:, :N]
    x_ref = jnp.linalg.solve(K, rhs[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-8)


def test_ldl_signs():
    """Quasi-definite => first n pivots positive, last m negative."""
    K = _qd_kkt(jax.random.PRNGKey(2), 4, 32, 32)
    L, d = ldl.ldl_factor(K, nb=16, n_pos=32, reg=1e-30)
    d = np.asarray(d)
    assert (d[:, :32] > 0).all()
    assert (d[:, 32:] < 0).all()


def _structured_kkt(key, B, S=5, D=8, order=4, m=66, delta=1e-5,
                    dtype=jnp.float64):
    """The polish regime: block-diagonal P with each (D, D) block of exact
    rank `order` (only degree>=order coefficients carry snap cost) and a wide
    spread of per-segment weights, plus a dense-ish constraint block."""
    n = S * D
    k1, k2, k3 = jax.random.split(key, 3)
    # like Qhat: only the top-left (order, order) sub-block is nonzero — the
    # null space is coordinate-aligned with the degree<order slots (that
    # alignment is what the static permutation exploits)
    Wb = jax.random.normal(k1, (B, S, order, order), dtype)
    w = 10.0 ** jax.random.uniform(k2, (B, S), dtype, -3.0, 1.0)
    pd = jnp.einsum('bsik,bsjk->bsij', Wb, Wb) * w[..., None, None]
    blocks = jnp.zeros((B, S, D, D), dtype).at[:, :, :order, :order].set(pd)
    P = jnp.zeros((B, n, n), dtype)
    for s in range(S):
        P = P.at[:, s * D:(s + 1) * D, s * D:(s + 1) * D].set(blocks[:, s])
    A = jax.random.normal(k3, (B, m, n), dtype)
    # like the polish KKT: a minority of constraint rows are live (the rest
    # are zeroed inactive padding).  With MORE dense rows than PD slots the
    # surplus dual pivots stay at exactly -delta and divide the null-slot
    # couplings — a regime the real active-set selection never produces
    # (max_active=64 live rows vs 60 PD + 66 eq slots).
    n_live = min(m, (S * order) + m // 4)
    A = A * (jnp.arange(m) < n_live)[None, :, None]
    K = jnp.zeros((B, n + m, n + m), dtype)
    K = K.at[:, :n, :n].set(P + delta * jnp.eye(n, dtype=dtype))
    K = K.at[:, :n, n:].set(jnp.swapaxes(A, 1, 2))
    K = K.at[:, n:, :n].set(A)
    K = K.at[:, n:, n:].set(-delta * jnp.eye(m, dtype=dtype))
    return K, n


def test_ldl_f32_permuted_structured():
    """f32 factor of the REAL polish regime (rank-deficient block-diag P)
    with the static PD-first/constraints/null-last permutation + refinement
    matches the f64 direct solve.

    In natural order this factorization hits exactly-delta pivots and loses
    ~1/3 of scenarios (the admm.polish docstring explains the ordering); the
    permutation is what this test locks in.
    """
    B, S, D, order, m = 16, 5, 8, 4, 66
    K64, n = _structured_kkt(jax.random.PRNGKey(3), B, S, D, order, m)
    rhs64 = jax.random.normal(jax.random.PRNGKey(4), (B, n + m), jnp.float64)
    kdim = n + m
    slot = np.arange(n) % D
    perm = np.concatenate([np.nonzero(slot < order)[0],
                           np.arange(n, kdim),
                           np.nonzero(slot >= order)[0]])
    iperm = np.argsort(perm)
    sign = np.where(np.arange(kdim) < n, 1.0, -1.0)[perm]
    K = K64.astype(jnp.float32)[:, perm][:, :, perm]
    rhs = rhs64.astype(jnp.float32)[:, perm]
    with jax.default_matmul_precision('float32'):
        Kp, rp, N = ldl.pad_to_block(K, rhs, nb=64)
        L, d = ldl.ldl_factor(Kp, nb=64, reg=1e-5,
                              sign=jnp.asarray(sign, jnp.float32))
        x = ldl.ldl_solve(L, d, rp)
        for _ in range(3):
            r = rp - jnp.einsum('bij,bj->bi', Kp, x)
            x = x + ldl.ldl_solve(L, d, r)
        x = np.asarray(x[:, :N])[:, iperm]
    x_ref = np.asarray(jnp.linalg.solve(K64, rhs64[..., None])[..., 0])
    scale = np.abs(x_ref).max(axis=1, keepdims=True)
    err = np.abs(x - x_ref) / scale
    assert err.max() < 1e-3, err.max()


def test_polish_ldl_matches_lu_end_to_end():
    """The LDL polish path must match the pivoted-LU path's solved rate and
    coefficients on real corridor scenarios in f32 (the deploy dtype)."""
    cfg = QPConfig()
    B = 32
    sc = scenarios.random_scenarios(cfg, B, seed=123, min_seg=1)
    args = [jnp.asarray(sc.state, jnp.float32),
            jnp.asarray(sc.hpolys, jnp.float32),
            jnp.asarray(sc.times, jnp.float32), jnp.asarray(sc.seg)]
    sols = {}
    with jax.default_matmul_precision('float32'):
        for method in ("lu", "ldl"):
            scfg = SolverConfig(polish_method=method)
            solve = jax.jit(lambda st, hp, tm, sg, s=scfg: admm.solve_qp(
                qp.build_qp(cfg, st, hp, tm, sg), s))
            sols[method] = solve(*args)
    s_lu = np.asarray(sols["lu"].solved)
    s_ldl = np.asarray(sols["ldl"].solved)
    # identical solved sets (not merely equal counts)
    np.testing.assert_array_equal(s_lu, s_ldl)
    both = s_lu & s_ldl
    assert both.sum() >= int(0.9 * B)
    dc = np.abs(np.asarray(sols["lu"].coeffs)
                - np.asarray(sols["ldl"].coeffs))[both]
    assert np.percentile(dc, 99) < 2e-3, np.percentile(dc, 99)
