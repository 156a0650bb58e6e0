"""Tiled fused ADMM chunk as a Pallas TPU kernel (round-2 solver core).

Replaces the per-scenario kernel in admm_kernel.py (correctness-verified but
MXU-starved at grid=B) with a TILE-of-scenarios design that keeps the ENTIRE
solver state and all per-scenario matrices VMEM-resident across every
iteration of a chunk.  This is the TPU-native replacement for the reference's
serial OSQP calls (qp_solver.hpp:298-358, layers.py:77-81).

Layout is the whole game (measured on v5e): a single (8, 128) lane<->sublane
relayout inside the iteration loop costs ~45us per batch-1024 iteration, and
a naive port of the math needs ~25 of them (one per matvec vector, one per
broadcast plane) -- 1.4 ms/iter, slower than the XLA scan it replaces.  This
kernel is arranged so the ENTIRE iteration performs exactly ONE relayout:

  x      (T, NQ)        flat coefficients, lane-major; feeds the MXU matmul
                        against the shared sampling operator directly.
  z, yhat(T, NC, NRR)   inequality slot / SCALED dual (yhat = y / rho_i),
                        TRANSPOSED row space: lanes = (segment, sample) rows
                        s*R + r padded to NRR (a lane multiple of 128),
                        sublanes = F corridor faces then 12 box slots
                        [axis j*4 + (+v, +a, -v, -a)], padded to NC = 64.
                        Broadcast planes arrive as (T, 1, NRR) lane-slices of
                        the sampling matmul output -- no relayout; the
                        adjoint's face contractions are cheap SUBLANE
                        reductions whose (T, NRR) results concatenate along
                        lanes straight into the mirror matmul.
  yehat  (T, MEQ, 1)    scaled equality dual (y_eq / rho_e), SUBLANE-major so
                        A_eq^T applies (mid-axis multiply + sublane reduce)
                        and the dual update (lane reduce, keepdims) both land
                        in-layout.
  Kx     (T, NQ, NQ)    fused refined solve 2*Minv - Minv M Minv, i.e. one
                        step of iterative refinement precomputed at chunk
                        boundaries (admm.admm_solve refines identically); the
                        x-update is ONE symmetric matvec whose vector
                        transpose is the single per-iteration relayout.
  Aeq    (T, MEQ, NQ)   dense equality rows, VMEM-resident for the chunk.

The corridor/box operator G is never materialized: G x goes through ONE
shared constant matmul x @ Cbig -> [pos|vel|acc per axis] sampled at all
(segment, sample) rows (MXU work), followed by per-scenario broadcast fmas in
the transposed row space; G^T w is the mirror image (3 sublane reductions + 6
sublane picks + one matmul against Cbig^T).  Scaled duals (OSQP eq. 9 with
y = rho*yhat) keep every per-row rho multiply out of the kernel: rho_i /
rho_e enter only as per-scenario broadcasts.

The chunk loop (refactor -> iterate -> residual -> rho rescale) and the
initial projection stay in XLA -- see admm_solve_tiled below, a drop-in for
admm.admm_solve.  Reference behavior preserved: relaxation alpha, sigma
regularization, divergence clips at |x| <= 1e6, |y| <= 1e6 (scaled to yhat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import bases, qp

NC = 64          # inequality sublane budget: F corridor faces + 12 box slots


def _pad128(v: int) -> int:
    return ((v + 127) // 128) * 128


def dims(cfg: QPConfig):
    NQ = _pad128(cfg.n_var)
    NRR = _pad128(cfg.max_seg * cfg.res)
    MEQ = _pad128(cfg.n_eq)
    return NQ, NRR, MEQ


def supported(cfg: QPConfig) -> bool:
    return cfg.max_faces + 12 <= NC


def _cbig_np(cfg: QPConfig):
    """(NQ, 9*NRR) shared sampling operator: column block k = c*3 + j
    (c in {pos, vel, acc}, j axis) holds, at column k*NRR + s*R + r, the
    tau-basis row Bc[r] placed in the (s, j) coefficient slots.

    Cbig[(3s+j)*D + d, (c*3+j)*NRR + s*R + r] = Bc[r, d]  (slot-scaled).
    """
    S, R, D = cfg.max_seg, cfg.res, cfg.D
    NQ, NRR, _ = dims(cfg)
    s_sc = bases.slot_scales(D, cfg.order)
    B012 = [np.asarray(b / s_sc, np.float64)
            for b in bases.sampled_bases(D, R)]
    C = np.zeros((NQ, 9 * NRR), np.float32)
    for c in range(3):
        for j in range(3):
            for s in range(S):
                rows = slice((3 * s + j) * D, (3 * s + j + 1) * D)
                cols = slice((c * 3 + j) * NRR + s * R,
                             (c * 3 + j) * NRR + s * R + R)
                C[rows, cols] = B012[c].T.astype(np.float32)
    return C


def _kernel(n_iters, sigma, alpha, F0, T, NQ, NRR, MEQ,
            cbig_hbm, cbigT_hbm, kx_hbm, aeq_hbm,
            nx_ref, ny_ref, nz_ref, h_ref, rmask_ref,
            beq_ref, rhoi_ref, rhoe_ref, yci_ref, yce_ref,
            x_ref, z_ref, yh_ref, yeh_ref,
            xo_ref, zo_ref, yho_ref, yeho_ref,
            cbig_ref, cbigT_ref, kx_ref, aeq_ref, sems):
    f32 = jnp.float32
    # The four 128-lane-aligned large operands stay in HBM (memory_space ANY)
    # and are DMA'd into single-buffered scratch ONCE per grid instance --
    # Pallas's default pipelining would double-buffer them and blow the VMEM
    # budget.
    i = pl.program_id(0)
    sl = pl.ds(i * T, T)
    copies = [
        pltpu.make_async_copy(cbig_hbm, cbig_ref, sems.at[0]),
        pltpu.make_async_copy(cbigT_hbm, cbigT_ref, sems.at[1]),
        pltpu.make_async_copy(kx_hbm.at[sl], kx_ref, sems.at[2]),
        pltpu.make_async_copy(aeq_hbm.at[sl], aeq_ref, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    cbig = cbig_ref[:]
    cbigT = cbigT_ref[:]
    Kx = kx_ref[:]
    Aeq = aeq_ref[:]
    nx = nx_ref[:]              # (T, NC, NRR)
    ny = ny_ref[:]
    nz = nz_ref[:]
    h = h_ref[:]
    rmask = rmask_ref[:]
    beq = beq_ref[:]            # (T, MEQ, 1)
    rhoi = rhoi_ref[:]          # (T, 1)
    rhoe = rhoe_ref[:]
    yci = yci_ref[:]            # (T, 1, 1) scaled-dual clip bounds
    yce = yce_ref[:]

    # box placement masks from SUBLANE iota: axis j vel at rows F0+4j (+) and
    # F0+4j+2 (-); acc at F0+4j+1 (+) and F0+4j+3 (-) -- the layout the
    # reference samples in qp_solver.hpp:255-296, stacked as ops/qp.apply_A.
    isub = jax.lax.broadcasted_iota(jnp.int32, (1, NC, 1), 1)

    def onehot(a):
        return jnp.where(isub == a, 1.0, 0.0).astype(f32)

    ev = [onehot(F0 + 4 * j) - onehot(F0 + 4 * j + 2) for j in range(3)]
    ea = [onehot(F0 + 4 * j + 1) - onehot(F0 + 4 * j + 3) for j in range(3)]

    def g_fwd(xr):
        """(T, NQ) -> (T, NC, NRR) corridor/box row values, zero relayouts."""
        pvec = jnp.dot(xr, cbig, preferred_element_type=f32)   # (T, 9*NRR)
        p = [pvec[:, k * NRR:(k + 1) * NRR][:, None, :] for k in range(9)]
        vi = p[0] * nx + p[1] * ny + p[2] * nz
        for j in range(3):
            vi = vi + ev[j] * p[3 + j]
            vi = vi + ea[j] * p[6 + j]
        return vi * rmask

    def g_adj(u):
        """(T, NC, NRR) -> (T, NQ): 9 masked SUBLANE reductions (cheap, and
        their offset-0 results concatenate cleanly -- direct sublane picks
        keep their tile offsets, which Mosaic's concat rejects) feeding the
        mirror matmul."""
        u = u * rmask
        parts = [jnp.sum(u * nx, axis=1), jnp.sum(u * ny, axis=1),
                 jnp.sum(u * nz, axis=1)]
        for j in range(3):
            parts.append(jnp.sum(u * ev[j], axis=1))
        for j in range(3):
            parts.append(jnp.sum(u * ea[j], axis=1))
        wstack = jnp.concatenate(parts, axis=1)                # (T, 9*NRR)
        return jnp.dot(wstack, cbigT, preferred_element_type=f32)

    def body(_, carry):
        x, z, yh, yeh = carry
        rrow = (sigma * x
                + rhoe * jnp.sum(Aeq * (beq - yeh), axis=1)
                + rhoi * g_adj(z - yh))
        # the single per-iteration relayout: rrow lanes -> sublanes for the
        # symmetric mid-axis matvec against the fused refined inverse.
        xt = jnp.sum(Kx * rrow[:, :, None], axis=1)
        xt = jnp.clip(xt, -1e6, 1e6)
        veq = jnp.sum(Aeq * xt[:, None, :], axis=2, keepdims=True)
        vi = g_fwd(xt)
        xn = alpha * xt + (1.0 - alpha) * x
        v = alpha * vi + (1.0 - alpha) * z + yh
        zn = jnp.minimum(v, h)
        yhn = jnp.clip(v - zn, -yci, yci)
        yehn = jnp.clip(yeh + alpha * (veq - beq), -yce, yce)
        return xn, zn, yhn, yehn

    x, z, yh, yeh = jax.lax.fori_loop(
        0, n_iters, body, (x_ref[:], z_ref[:], yh_ref[:], yeh_ref[:]))
    xo_ref[:] = x
    zo_ref[:] = z
    yho_ref[:] = yh
    yeho_ref[:] = yeh


def run_chunk(cfg: QPConfig, consts, mats, state, n_iters: int,
              sigma: float, alpha: float, tile: int,
              interpret: bool = False):
    """One fused chunk over the full batch: grid = B // tile instances."""
    NQ, NRR, MEQ = dims(cfg)
    cbig, cbigT = consts
    kx, aeq, nx, ny, nz, h, rmask, beq, rhoi, rhoe, yci, yce = mats
    x, z, yh, yeh = state
    B = x.shape[0]
    T = tile
    assert B % T == 0, (B, T)
    G = B // T

    kern = functools.partial(_kernel, n_iters, sigma, alpha, cfg.max_faces,
                             T, NQ, NRR, MEQ)

    def hbm():
        return pl.BlockSpec(memory_space=pltpu.ANY)

    def s3(r, c):
        return pl.BlockSpec((T, r, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def s2(c):
        return pl.BlockSpec((T, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[hbm()] * 4 + [
            s3(NC, NRR), s3(NC, NRR), s3(NC, NRR),
            s3(NC, NRR), s3(NC, NRR),
            s3(MEQ, 1), s2(1), s2(1), s3(1, 1), s3(1, 1),
            s2(NQ), s3(NC, NRR), s3(NC, NRR), s3(MEQ, 1),
        ],
        input_output_aliases={14: 0, 15: 1, 16: 2, 17: 3},
        out_specs=(s2(NQ), s3(NC, NRR), s3(NC, NRR), s3(MEQ, 1)),
        out_shape=(
            jax.ShapeDtypeStruct((B, NQ), f32),
            jax.ShapeDtypeStruct((B, NC, NRR), f32),
            jax.ShapeDtypeStruct((B, NC, NRR), f32),
            jax.ShapeDtypeStruct((B, MEQ, 1), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((NQ, 9 * NRR), f32),
            pltpu.VMEM((9 * NRR, NQ), f32),
            pltpu.VMEM((T, NQ, NQ), f32),
            pltpu.VMEM((T, MEQ, NQ), f32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cbig, cbigT, kx, aeq, nx, ny, nz, h, rmask,
      beq, rhoi, rhoe, yci, yce, x, z, yh, yeh)


# ---------------------------------------------------------------------------
# packing between the structured QPData world and the kernel layout
# ---------------------------------------------------------------------------

def _pack_scenario(data: qp.QPData):
    """Per-scenario constants that survive across chunks (transposed rows)."""
    cfg = data.cfg
    NQ, NRR, MEQ = dims(cfg)
    S, R, F = cfg.max_seg, cfg.res, cfg.max_faces
    NR = S * R
    B = data.times.shape[0]
    f32 = jnp.float32

    def nj(j):
        a = jnp.repeat(data.normals[:, :, :, j], R, axis=1)    # (B, NR, F)
        out = jnp.zeros((B, NC, NRR), f32)
        return out.at[:, :F, :NR].set(
            a.astype(f32).transpose(0, 2, 1))

    nx, ny, nz = nj(0), nj(1), nj(2)

    h = jnp.ones((B, NC, NRR), f32)
    h = h.at[:, :F, :NR].set(
        data.h_corr.reshape(B, NR, F).astype(f32).transpose(0, 2, 1))
    hb = jnp.broadcast_to(data.h_box, (B, S, R, 3, 4)).reshape(B, NR, 12)
    h = h.at[:, F:F + 12, :NR].set(hb.astype(f32).transpose(0, 2, 1))

    rmask = jnp.zeros((B, NC, NRR), f32)
    fm = jnp.repeat(data.face_mask, R, axis=1)                 # (B, NR, F)
    rmask = rmask.at[:, :F, :NR].set(fm.astype(f32).transpose(0, 2, 1))
    sm = jnp.repeat(data.seg_mask, R, axis=1)[:, None, :]      # (B, 1, NR)
    rmask = rmask.at[:, F:F + 12, :NR].set(
        jnp.broadcast_to(sm, (B, 12, NR)).astype(f32))

    Aeq, beq = qp.dense_eq(data)
    m_eq = Aeq.shape[1]
    aeq = jnp.zeros((B, MEQ, NQ), f32)
    aeq = aeq.at[:, :m_eq, :cfg.n_var].set(Aeq.astype(f32))
    beq_p = jnp.zeros((B, MEQ, 1), f32).at[:, :m_eq, 0].set(beq.astype(f32))
    return (nx, ny, nz, h, rmask, aeq, beq_p)


def _fused_refined_inverse(M, Minv, NQ):
    """Kx = 2*Minv - Minv M Minv padded to (B, NQ, NQ): applying Kx is
    algebraically one step of iterative refinement of the Minv solve
    (admm.admm_solve:141-145), precomputed so the kernel does ONE matvec."""
    kx = 2.0 * Minv - Minv @ (M @ Minv)
    B, n, _ = kx.shape
    out = jnp.tile(jnp.eye(NQ, dtype=jnp.float32)[None], (B, 1, 1))
    return out.at[:, :n, :n].set(kx.astype(jnp.float32))


def _x_pack(x, cfg, NQ):
    B = x.shape[0]
    flat = x.reshape(B, cfg.n_var).astype(jnp.float32)
    return jnp.zeros((B, NQ), jnp.float32).at[:, :cfg.n_var].set(flat)


def _x_unpack(xp, cfg, dtype):
    B = xp.shape[0]
    return xp[:, :cfg.n_var].reshape(
        B, cfg.max_seg, 3, cfg.D).astype(dtype)


def _ineq_pack(tree, cfg, NRR):
    B = tree['corr'].shape[0]
    S, R, F = cfg.max_seg, cfg.res, cfg.max_faces
    NR = S * R
    out = jnp.zeros((B, NC, NRR), jnp.float32)
    out = out.at[:, :F, :NR].set(
        tree['corr'].reshape(B, NR, F).astype(jnp.float32).transpose(0, 2, 1))
    out = out.at[:, F:F + 12, :NR].set(
        tree['box'].reshape(B, NR, 12).astype(jnp.float32).transpose(0, 2, 1))
    return out


def _ineq_unpack(arr, cfg, dtype):
    B = arr.shape[0]
    S, R, F = cfg.max_seg, cfg.res, cfg.max_faces
    NR = S * R
    return {
        'corr': arr[:, :F, :NR].transpose(0, 2, 1).reshape(
            B, S, R, F).astype(dtype),
        'box': arr[:, F:F + 12, :NR].transpose(0, 2, 1).reshape(
            B, S, R, 3, 4).astype(dtype),
    }


def _yeq_pack(tree, MEQ):
    flat = qp.tree_flat({k: tree[k] for k in qp.EQ_KEYS}, qp.EQ_KEYS)
    B, m = flat.shape
    return jnp.zeros((B, MEQ, 1), jnp.float32).at[:, :m, 0].set(
        flat.astype(jnp.float32))


def _yeq_unpack(arr, cfg, dtype):
    B = arr.shape[0]
    S, o = cfg.max_seg, cfg.order
    row = arr[:, :, 0].astype(dtype)
    return {
        'start': row[:, 0:9].reshape(B, 3, 3),
        'end': row[:, 9:18].reshape(B, 3, 3),
        'junc': row[:, 18:18 + (S - 1) * 3 * o].reshape(B, S - 1, 3, o),
    }


def admm_solve_tiled(data: qp.QPData, scfg: SolverConfig, x0=None, y0=None,
                     interpret: bool = False):
    """Drop-in replacement for admm.admm_solve with the fused tiled kernel
    as the inner iteration engine.  Signature/result match admm_solve
    (including the x0/y0 primal/dual warm start).

    Batches that do not divide the tile are PADDED up to the next tile
    multiple (scenario 0 replicated) and the results sliced back: Mosaic
    requires per-block row counts divisible by 8 unless the block spans the
    whole array, so shrinking the tile below 8 (the old fallback) fails to
    lower for e.g. B=500."""
    B = data.times.shape[0]
    T = min(scfg.pallas_tile, B)
    if B > T and B % T:
        pad = T - B % T
        pad_leaf = lambda a: (jnp.concatenate([a, a[:pad]], axis=0)
                              if hasattr(a, 'ndim') and a.ndim and
                              a.shape[0] == B else a)
        data_p = jax.tree.map(pad_leaf, data)
        x0_p = None if x0 is None else pad_leaf(x0)
        y0_p = None if y0 is None else jax.tree.map(pad_leaf, y0)
        out = _admm_solve_tiled_impl(data_p, scfg, x0_p, y0_p, interpret)
        return jax.tree.map(
            lambda a: a[:B] if hasattr(a, 'ndim') and a.ndim and
            a.shape[0] == B + pad else a, out)
    return _admm_solve_tiled_impl(data, scfg, x0, y0, interpret)


def _admm_solve_tiled_impl(data: qp.QPData, scfg: SolverConfig, x0=None,
                           y0=None, interpret: bool = False):
    from allocnet_tpu.ops import admm as admm_mod

    cfg = data.cfg
    dtype = data.times.dtype
    B = data.times.shape[0]
    NQ, NRR, MEQ = dims(cfg)
    T = min(scfg.pallas_tile, B)
    while B % T:
        T //= 2

    beq_tree = qp.eq_rhs(data)
    hh = qp.ineq_rhs(data)

    x = jnp.zeros((B, cfg.max_seg, 3, cfg.D), dtype) if x0 is None else x0
    z = admm_mod._project(qp.apply_A(data, x), beq_tree, hh)
    y = jax.tree.map(jnp.zeros_like, z) if y0 is None else y0

    rho_i, rho_floor = admm_mod.initial_rho(data, scfg, jnp.float32)
    rho_e = rho_i * scfg.rho_eq_scale
    sigma = float(scfg.sigma)
    alpha = float(scfg.alpha)

    cbig_np = _cbig_np(cfg)
    cbig = jnp.asarray(cbig_np)
    cbigT = jnp.asarray(cbig_np.T.copy())
    nx, ny, nz, h, rmask, aeq, beq_p = _pack_scenario(data)

    xp = _x_pack(x, cfg, NQ)
    zp = _ineq_pack({k: z[k] for k in qp.INEQ_KEYS}, cfg, NRR)
    yhp = _ineq_pack({k: y[k] for k in qp.INEQ_KEYS}, cfg, NRR) \
        / rho_i[:, None, None]
    yehp = _yeq_pack(y, MEQ) / rho_e[:, None, None]

    # chunks as a lax.scan: the body (normal-matrix rebuild + fused inverse
    # + one pallas_call + rho adaptation) is identical per chunk; unrolled
    # it instantiated n_chunks copies of the kernel in the compiled program
    # and compile time scaled with the budget.  The first chunk's inverse
    # is a Cholesky; later chunks cross the rho rescale with the
    # Newton-Schulz update (admm.ns_update_inverse) — ~10 MXU matmuls
    # instead of a fresh batched 120x120 factorization (f = 1 on the first
    # pass keeps the scan body uniform: the update is exactly the identity).
    M0 = qp.normal_matrix(data, sigma, rho_e.astype(dtype),
                          rho_i.astype(dtype))
    Minv0 = admm_mod.spd_inverse(M0)
    if scfg.ns_rho_update:
        Nmat = qp.normal_matrix(data, sigma, jnp.zeros((), dtype),
                                jnp.zeros((), dtype))
        P0 = M0 - Nmat
    else:
        Nmat = P0 = jnp.zeros((), dtype)

    def one_chunk(carry, _):
        xp, zp, yhp, yehp, rho_i, rho_e, Minv, P, f = carry
        if scfg.ns_rho_update:
            Minv, P = admm_mod.ns_update_inverse(Minv, P, f, Nmat)
            M = Nmat + P
        else:
            M = qp.normal_matrix(data, sigma, rho_e.astype(dtype),
                                 rho_i.astype(dtype))
            Minv = admm_mod.spd_inverse(M)
        mats = (
            _fused_refined_inverse(M.astype(jnp.float32),
                                   Minv.astype(jnp.float32), NQ), aeq,
            nx, ny, nz, h, rmask, beq_p,
            rho_i[:, None], rho_e[:, None],
            (1e6 / rho_i)[:, None, None], (1e6 / rho_e)[:, None, None],
        )
        xp, zp, yhp, yehp = run_chunk(
            cfg, (cbig, cbigT), mats, (xp, zp, yhp, yehp),
            scfg.iters_per_chunk, sigma, alpha, T, interpret=interpret)

        x = _x_unpack(xp, cfg, dtype)
        zi = _ineq_unpack(zp, cfg, dtype)
        yi = _ineq_unpack(yhp * rho_i[:, None, None], cfg, dtype)
        ye = _yeq_unpack(yehp * rho_e[:, None, None], cfg, dtype)
        z = dict(beq_tree, **zi)
        y = dict(ye, **yi)

        pri, pri_rel, dua, dua_rel = admm_mod._residuals(
            data, x, z, y, beq_tree, hh)
        ratio = jnp.sqrt((pri / jnp.maximum(pri_rel, 1e-12))
                         / jnp.maximum(dua / jnp.maximum(dua_rel, 1e-12),
                                       1e-12)).astype(jnp.float32)
        factor = jnp.clip(ratio, 0.5, 5.0)
        rho_i_new = jnp.clip(rho_i * factor, rho_floor, 100.0)
        # rescale the packed scaled duals to the new rho before re-entering
        yhp = yhp * (rho_i / rho_i_new)[:, None, None]
        yehp = yehp * (rho_i / rho_i_new)[:, None, None]
        # effective (post-clip) rescale factor for the next chunk's
        # Newton-Schulz inverse update; stays in [0.5, 5]
        f_new = rho_i_new / rho_i
        rho_i = rho_i_new
        rho_e = rho_i * scfg.rho_eq_scale
        return (xp, zp, yhp, yehp, rho_i, rho_e, Minv, P, f_new), None

    (xp, zp, yhp, yehp, rho_i, rho_e, _, _, _), _ = jax.lax.scan(
        one_chunk,
        (xp, zp, yhp, yehp, rho_i, rho_e, Minv0, P0,
         jnp.ones((B,), jnp.float32)),
        None, length=scfg.n_chunks)

    x = _x_unpack(xp, cfg, dtype)
    zi = _ineq_unpack(zp, cfg, dtype)
    yi = _ineq_unpack(yhp * rho_i[:, None, None], cfg, dtype)
    ye = _yeq_unpack(yehp * rho_e[:, None, None], cfg, dtype)
    z = dict(beq_tree, **zi)
    y = dict(ye, **yi)

    pri, _, dua, _ = admm_mod._residuals(data, x, z, y, beq_tree, hh)
    return x, z, y, rho_e.astype(dtype), rho_i.astype(dtype), pri, dua
