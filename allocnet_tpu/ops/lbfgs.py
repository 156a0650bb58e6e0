"""Batched fixed-iteration L-BFGS (two-loop recursion + Armijo backtracking).

TPU-native replacement for the reference's vendored lbfgs.hpp (Lewis-Overton
line search, lbfgs.hpp:434): fully fixed-shape — static memory, static
iteration counts, masked line search — so thousands of small optimizations
(e.g. 9-variable MVIE fits) run in one vmapped program.  Gradients come from
jax.grad of the objective instead of hand-coded callbacks.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def minimize(
    fun: Callable,
    x0: jax.Array,
    iters: int = 60,
    memory: int = 8,
    ls_steps: int = 12,
    ls_decay: float = 0.5,
    armijo: float = 1e-4,
    init_step: float = 1.0,
):
    """Minimize fun: (n,) -> scalar starting at x0 (n,). Batched via vmap.

    Returns (x, f(x)).  All loops are lax-fixed-shape; a failed line search
    keeps the iterate (masked no-op), so the routine is total.
    """
    n = x0.shape[-1]
    dt = x0.dtype
    val_grad = jax.value_and_grad(fun)

    S = jnp.zeros((memory, n), dt)
    Y = jnp.zeros((memory, n), dt)
    RHO = jnp.zeros((memory,), dt)

    def direction(g, S, Y, RHO, k):
        """Two-loop recursion over the valid memory entries."""
        q = g
        alphas = jnp.zeros((memory,), dt)

        def bwd(i, carry):
            q, alphas = carry
            j = (k - 1 - i) % memory
            valid = i < jnp.minimum(k, memory)
            a = RHO[j] * jnp.dot(S[j], q)
            a = jnp.where(valid, a, 0.0)
            q = q - a * Y[j]
            return q, alphas.at[j].set(a)

        q, alphas = jax.lax.fori_loop(0, memory, bwd, (q, alphas))

        # initial Hessian scaling gamma = s.y / y.y of most recent pair
        jlast = (k - 1) % memory
        have = k > 0
        yy = jnp.dot(Y[jlast], Y[jlast])
        sy = jnp.dot(S[jlast], Y[jlast])
        gamma = jnp.where(have & (yy > 1e-12), sy / jnp.maximum(yy, 1e-12), 1.0)
        r = q * gamma

        def fwd(i, r):
            j = (k - jnp.minimum(k, memory) + i) % memory
            valid = i < jnp.minimum(k, memory)
            beta = RHO[j] * jnp.dot(Y[j], r)
            upd = (alphas[j] - beta) * S[j]
            return r + jnp.where(valid, upd, 0.0)

        r = jax.lax.fori_loop(0, memory, fwd, r)
        return -r

    def line_search(x, f, g, d):
        """Fixed-trial backtracking: prefer the first Armijo-satisfying step,
        else fall back to the best strictly-decreasing trial (guarantees
        monotone progress — a pure Armijo reject would freeze the iterate and
        the direction with it)."""
        gtd = jnp.dot(g, d)
        # fall back to steepest descent if d is not a descent direction
        d = jnp.where(gtd < 0, d, -g)
        gtd = jnp.minimum(gtd, -jnp.dot(g, g))

        ts = init_step * ls_decay ** jnp.arange(ls_steps, dtype=dt)
        fs = jax.vmap(lambda t: fun(x + t * d))(ts)
        fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)

        armijo_ok = fs <= f + armijo * ts * gtd
        first_ok = jnp.argmax(armijo_ok)
        any_armijo = jnp.any(armijo_ok)

        best = jnp.argmin(fs)
        any_decrease = fs[best] < f

        idx = jnp.where(any_armijo, first_ok, best)
        found = any_armijo | any_decrease
        t = jnp.where(found, ts[idx], 0.0)
        ft = jnp.where(found, fs[idx], f)
        return t, ft, found, d

    def step(carry, _):
        x, f, g, S, Y, RHO, k = carry
        d = direction(g, S, Y, RHO, k)
        t, ft, found, d = line_search(x, f, g, d)
        x_new = x + t * d
        f_new, g_new = val_grad(x_new)
        s = x_new - x
        y = g_new - g
        sy = jnp.dot(s, y)
        slot = k % memory
        good = found & (sy > 1e-12)
        S = S.at[slot].set(jnp.where(good, s, S[slot]))
        Y = Y.at[slot].set(jnp.where(good, y, Y[slot]))
        RHO = RHO.at[slot].set(jnp.where(good, 1.0 / jnp.maximum(sy, 1e-12),
                                         RHO[slot]))
        k = k + jnp.where(good, 1, 0)
        x = jnp.where(found, x_new, x)
        f = jnp.where(found, f_new, f)
        g = jnp.where(found, g_new, g)
        return (x, f, g, S, Y, RHO, k), None

    f0, g0 = val_grad(x0)
    carry = (x0, f0, g0, S, Y, RHO, jnp.zeros((), jnp.int32))
    carry, _ = jax.lax.scan(step, carry, None, length=iters)
    x, f, *_ = carry
    return x, f
