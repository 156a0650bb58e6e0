"""Fused ADMM chunk as a single Pallas TPU kernel.

The XLA scan version (ops/admm.py) round-trips the (x, z, y) state and the
normal-matrix inverse through HBM every iteration; this kernel keeps the
ENTIRE solver state of one scenario resident in VMEM across all iterations
of a chunk — per-iteration HBM traffic drops to zero and the loop becomes a
handful of small VMEM matmuls.

Mosaic-dialect notes (v5e, discovered by probing): no in-kernel transposes,
no scatter (`.at[].add`), no dynamic_update_slice `.at[].set`, no
sublane<->lane reshapes, and all materialized values keep a lane width that
is a multiple of 16 (narrower arrays fail elementwise lowering).  Hence:
pre-transposed constants are inputs, equality rows are applied as one dense
(128,128) matmul instead of structured pieces, flatten/unflatten go through
lane concatenation of (1,16) row slices, and block-diagonal assemblies are
built by concatenating zero-padded strips.

Layouts (per scenario, float32):
  X       : (8, 16)    rows = coeff slot d (D=8), cols = (segment, axis)
                       pairs 3s+j (15 used, 1 pad)
  zi / yi : (100, 64)  rows = (segment, sample) s*R+r; cols 0:50 corridor
                       faces, 50:62 box [axis j * 4 + (+v,+a,-v,-a)]
  ye/beq  : (1, 128)   dense equality rows (66 used)
  Minv/M/Aeq : (128, 128) over the d-major flat index d*16 + (3s+j)
Only the deploy shape (order=4, S=5, R=20, F=50) is supported; other configs
fall back to the XLA path (see admm._solve_qp_impl).

STATUS (v5e, measured): compiles and matches the XLA path's solutions
(243/256 solved on the bench batch, identical post-polish coefficients), but
at ~613 solves/s vs the XLA path's ~1254/s — the per-scenario grid leaves the
MXU at 1/128th utilization on the (1,128) matvec chains and ~50 small
sequential matmuls per iteration are launch-latency-bound.  Next step for a
real win: process TILE=8 scenarios per kernel instance with block-diagonal
(1024,1024) normal matrices so every matmul contracts over >= 1024 lanes
(VMEM budget: ~8 MB for M/Minv tiles, fits v5e's 16 MB with single-buffered
constants).  Until then the flag defaults off; the kernel is kept as the
correctness-verified foundation.
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

S, R, F, D = 5, 20, 50, 8
NSJ = 16            # padded (segment, axis) pairs (15 used)
NI = S * R          # 100 ineq row groups
NC = 64             # padded ineq cols (50 corr + 12 box)
HIGH = jax.lax.Precision.HIGHEST


def supported(cfg: QPConfig) -> bool:
    return (cfg.order, cfg.max_seg, cfg.res, cfg.max_faces) == (4, S, R, F)


def _consts_np():
    s = bases.slot_scales(D, 4)
    B0, B1, B2 = (b / s for b in bases.sampled_bases(D, R))
    return (np.asarray(B0, np.float32), np.asarray(B1, np.float32),
            np.asarray(B2, np.float32))


def basis_bundle() -> np.ndarray:
    """(160, 64) constant bundle:
    rows 0:60   B012  (cols 0:8)
    rows 60:68  B012^T (cols 0:60)
    rows 68:84  Ebox  (16, 64): [vel|acc] cols -> box cols 50:62
    rows 84:148 Ebox^T (64, 16 in cols 0:16)
    """
    B0, B1, B2 = _consts_np()
    B012 = np.concatenate([B0, B1, B2], axis=0)            # (60, 8)
    out = np.zeros((160, 64), np.float32)
    out[0:60, 0:8] = B012
    out[60:68, 0:60] = B012.T
    E = np.zeros((16, 64), np.float32)
    for j in range(3):
        E[j, 50 + 4 * j + 0] = 1.0
        E[j, 50 + 4 * j + 2] = -1.0
        E[3 + j, 50 + 4 * j + 1] = 1.0
        E[3 + j, 50 + 4 * j + 3] = -1.0
    out[68:84, 0:64] = E
    out[84:148, 0:16] = E.T
    out[148:156, 0:8] = np.eye(8, dtype=np.float32)
    return out


def seg_consts():
    """Per-segment constant matrices (all matmul-based to sidestep Mosaic
    layout-offset restrictions):
      dm3  (80, 16): 5 stacked diag masks keeping cols 3s:3s+3
      eva  (80, 64): 5 stacked vel->box placements (+1 at 4j, -1 at 4j+2)
      eaa  (80, 64): 5 stacked acc->box placements (+1 at 4j+1, -1 at 4j+3)
      evaT (320,16), eaaT (320,16): their transposes
    """
    dm3 = np.zeros((5 * 16, 16), np.float32)
    eva = np.zeros((5 * 16, 64), np.float32)
    eaa = np.zeros((5 * 16, 64), np.float32)
    for s_ in range(S):
        for j in range(3):
            dm3[s_ * 16 + 3 * s_ + j, 3 * s_ + j] = 1.0
            eva[s_ * 16 + 3 * s_ + j, 50 + 4 * j + 0] = 1.0
            eva[s_ * 16 + 3 * s_ + j, 50 + 4 * j + 2] = -1.0
            eaa[s_ * 16 + 3 * s_ + j, 50 + 4 * j + 1] = 1.0
            eaa[s_ * 16 + 3 * s_ + j, 50 + 4 * j + 3] = -1.0
    evaT = np.concatenate([eva[k * 16:(k + 1) * 16].T for k in range(S)])
    eaaT = np.concatenate([eaa[k * 16:(k + 1) * 16].T for k in range(S)])
    return dm3, eva, eaa, evaT, eaaT


def _dmajor_perm() -> np.ndarray:
    """perm[q'] = source flat (s,j,d) index for d-major order q' = d*16+sj."""
    perm = np.zeros(128, np.int64)
    for d in range(D):
        for sj in range(NSJ):
            perm[d * NSJ + sj] = sj * D + d if sj < 15 else 120 + d
    return perm


def _kernel(n_iters, sigma, alpha,
            ball_ref, sel_ref, dm3_ref, eva_ref, eaa_ref, evaT_ref, eaaT_ref,
            minvT_ref, mT_ref, aeqT_ref, aeq_ref,
            nmat_ref, nmatT_ref, h_ref, rowmask_ref, beq_ref, rho_ref,
            x_ref, zi_ref, yi_ref, ye_ref,
            xo_ref, zo_ref, yo_ref, yeo_ref):
    ball = ball_ref[:]
    B012 = ball[0:60, 0:8]
    B012T = ball[60:68, 0:60]
    Ebox = ball[68:84, 0:64]
    EboxT = ball[84:148, 0:16]
    E8 = ball[148:156, 0:8]
    sel = sel_ref[:]              # (128, 128) identity (unflatten selects)
    dm3 = dm3_ref[:]
    eva = eva_ref[:]
    eaa = eaa_ref[:]
    evaT = evaT_ref[:]
    eaaT = eaaT_ref[:]

    def _dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=HIGH)

    MinvT = minvT_ref[:]
    MT = mT_ref[:]
    AeqT = aeqT_ref[:]            # (128,128): veq_row = xrow @ AeqT
    Aeq = aeq_ref[:]              # (128,128): xcot_row = weq_row @ Aeq
    Nmat = nmat_ref[:]            # (16, 64)
    NmatT = nmatT_ref[:]          # (64, 16)
    h = h_ref[:]                  # (100, 64)
    rowmask = rowmask_ref[:]      # (100, 64)
    beq = beq_ref[:]              # (1, 128)
    rho_i = rho_ref[0, 0]
    rho_e = rho_ref[0, 1]

    def flat(X):
        """(8,16) -> (1,128): matmul-extracted rows (canonical layouts; raw
        slice concats trip Mosaic's offset rules)."""
        pieces = [jnp.dot(E8[d:d + 1, :], X,
                          preferred_element_type=jnp.float32,
                          precision=HIGH) for d in range(D)]
        return jnp.concatenate(pieces, axis=1)

    def unflat(row):
        """(1,128) -> (8,16) via identity-matmul selections."""
        pieces = [jnp.dot(row, sel[:, d * NSJ:(d + 1) * NSJ],
                          preferred_element_type=jnp.float32,
                          precision=HIGH) for d in range(D)]
        return jnp.concatenate(pieces, axis=0)

    def apply_A_in(X):
        """Ineq values (100, 64): corridor rows + box rows, built purely
        from matmuls with per-segment constant maps."""
        pva = _dot(B012, X)                                 # (60, 16)
        pos, vel, acc = pva[0:20], pva[20:40], pva[40:60]
        # block-diagonal pos: segment s keeps cols 3s:3s+3 (diag-mask matmul)
        posb = jnp.concatenate(
            [_dot(pos, dm3[s_ * 16:(s_ + 1) * 16]) for s_ in range(S)],
            axis=0)                                         # (100, 16)
        vals = _dot(posb, Nmat)                             # (100, 64)
        # box rows: vel/acc placed into cols 50:62 by per-segment maps
        box_rows = [
            _dot(vel, eva[s_ * 16:(s_ + 1) * 16])
            + _dot(acc, eaa[s_ * 16:(s_ + 1) * 16])
            for s_ in range(S)]
        vals = vals + jnp.concatenate(box_rows, axis=0)
        return vals * rowmask

    def apply_AT_in(wi):
        """Adjoint of apply_A_in -> X cotangent (8, 16)."""
        wi = wi * rowmask
        posb_cot = _dot(wi, NmatT)                          # (100, 16)
        pos_cot = jnp.zeros((R, NSJ), jnp.float32)
        vel_cot = jnp.zeros((R, NSJ), jnp.float32)
        acc_cot = jnp.zeros((R, NSJ), jnp.float32)
        for s_ in range(S):
            slab = posb_cot[s_ * R:(s_ + 1) * R, :]
            pos_cot = pos_cot + _dot(slab, dm3[s_ * 16:(s_ + 1) * 16])
            wslab = wi[s_ * R:(s_ + 1) * R, :]
            vel_cot = vel_cot + _dot(wslab, evaT[s_ * 64:(s_ + 1) * 64])
            acc_cot = acc_cot + _dot(wslab, eaaT[s_ * 64:(s_ + 1) * 64])
        pva_cot = jnp.concatenate([pos_cot, vel_cot, acc_cot], axis=0)
        return _dot(B012T, pva_cot)

    def body(_, carry):
        X, xrow, zi, yi, ye = carry
        # rhs = sigma x + Aeq^T(rho_e beq - ye) + G^T(rho_i z - y),
        # assembled in row space (matvec chains stay (1,128) throughout)
        weq = rho_e * beq - ye
        rrow = (sigma * xrow
                + jnp.dot(weq, Aeq, preferred_element_type=jnp.float32,
                          precision=HIGH)
                + flat(apply_AT_in(rho_i * zi - yi)))
        xt_row = jnp.dot(rrow, MinvT, preferred_element_type=jnp.float32,
                         precision=HIGH)
        resid = rrow - jnp.dot(xt_row, MT, preferred_element_type=jnp.float32,
                               precision=HIGH)
        xt_row = xt_row + jnp.dot(resid, MinvT,
                                  preferred_element_type=jnp.float32,
                                  precision=HIGH)
        xt_row = jnp.clip(xt_row, -1e6, 1e6)
        Xt = unflat(xt_row)

        veq = jnp.dot(xt_row, AeqT, preferred_element_type=jnp.float32,
                      precision=HIGH)                       # (1, 128)
        vi = apply_A_in(Xt)

        Xn = alpha * Xt + (1.0 - alpha) * X
        xrow_n = alpha * xt_row + (1.0 - alpha) * xrow
        v = alpha * vi + (1.0 - alpha) * zi + yi / rho_i
        zn = jnp.minimum(v, h)
        yn = jnp.clip((v - zn) * rho_i, -1e6, 1e6)
        ye_n = jnp.clip(ye + rho_e * alpha * (veq - beq), -1e6, 1e6)
        return Xn, xrow_n, zn, yn, ye_n

    X0 = x_ref[:]
    X, _, zi, yi, ye = jax.lax.fori_loop(
        0, n_iters, body, (X0, flat(X0), zi_ref[:], yi_ref[:], ye_ref[:]))
    xo_ref[:] = X
    zo_ref[:] = zi
    yo_ref[:] = yi
    yeo_ref[:] = ye


def _spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def run_chunk(minvT, mT, aeqT, aeq, nmat, nmatT, h, rowmask, beq, rho,
              x, zi, yi, ye, n_iters: int, sigma: float, alpha: float,
              interpret: bool = False):
    """Batched over the leading dim via vmap of the single-scenario kernel."""
    kern = functools.partial(_kernel, n_iters, sigma, alpha)
    B = x.shape[0]
    ball = jnp.broadcast_to(jnp.asarray(basis_bundle()), (B, 160, 64))
    sel = jnp.broadcast_to(jnp.eye(128, dtype=jnp.float32), (B, 128, 128))
    dm3_c, eva_c, eaa_c, evaT_c, eaaT_c = [
        jnp.broadcast_to(jnp.asarray(c), (B,) + c.shape) for c in seg_consts()]

    def one(bb, *args):
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((D, NSJ), jnp.float32),
                jax.ShapeDtypeStruct((NI, NC), jnp.float32),
                jax.ShapeDtypeStruct((NI, NC), jnp.float32),
                jax.ShapeDtypeStruct((1, 128), jnp.float32),
            ),
            in_specs=[_spec()] * 21,
            out_specs=(_spec(),) * 4,
            interpret=interpret,
        )(bb, *args)

    return jax.vmap(one)(ball, sel, dm3_c, eva_c, eaa_c, evaT_c, eaaT_c,
                         minvT, mT, aeqT, aeq, nmat, nmatT, h,
                         rowmask, beq, rho, x, zi, yi, ye)


# ---------------------------------------------------------------------------
# host-side packing + drop-in admm_solve replacement
# ---------------------------------------------------------------------------

def _pack_static(data, rho_e, rho_i):
    B = data.times.shape[0]
    f32 = jnp.float32

    nmat = jnp.zeros((B, NSJ, NC), f32)
    nmat = nmat.at[:, 0:15, 0:F].set(
        jnp.transpose(data.normals, (0, 1, 3, 2)).reshape(B, 15, F)
        .astype(f32))
    nmatT = jnp.swapaxes(nmat, 1, 2)

    h = jnp.ones((B, NI, NC), f32)
    h = h.at[:, :, 0:F].set(data.h_corr.reshape(B, NI, F).astype(f32))
    hb = jnp.broadcast_to(data.h_box, (B, S, R, 3, 4)).reshape(B, NI, 12)
    h = h.at[:, :, 50:62].set(hb.astype(f32))

    rowmask = jnp.zeros((B, NI, NC), f32)
    fm = jnp.repeat(data.face_mask, R, axis=1).reshape(B, NI, F)
    rowmask = rowmask.at[:, :, 0:F].set(fm.astype(f32))
    sm = jnp.repeat(data.seg_mask, R, axis=1)[:, :, None]
    rowmask = rowmask.at[:, :, 50:62].set(
        jnp.broadcast_to(sm, (B, NI, 12)).astype(f32))

    rho = jnp.stack([jnp.broadcast_to(rho_i, (B,)),
                     jnp.broadcast_to(rho_e, (B,))], axis=1).astype(f32)
    return nmat, nmatT, h, rowmask, rho[:, None, :]


def _pack_eq(data):
    """Dense equality rows (qp.dense_eq) in the kernel's d-major flat order."""
    Aeq, beq = qp.dense_eq(data)
    B, m_eq, n = Aeq.shape
    perm = _dmajor_perm()
    cols = jnp.zeros((B, 128, n), jnp.float32)
    cols = cols.at[:, :m_eq, :].set(Aeq.astype(jnp.float32))
    Ad = jnp.zeros((B, 128, 128), jnp.float32)
    dst = np.nonzero(perm < 120)[0]
    src = perm[perm < 120]
    Ad = Ad.at[:, :, dst].set(cols[:, :, src])
    beq_row = jnp.zeros((B, 1, 128), jnp.float32)
    beq_row = beq_row.at[:, 0, :m_eq].set(beq.astype(jnp.float32))
    return jnp.swapaxes(Ad, 1, 2), Ad, beq_row   # (AeqT, Aeq, beq_row)


def _x_to_kernel(x):
    B = x.shape[0]
    X = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, D, 15)
    return jnp.pad(X, ((0, 0), (0, 0), (0, 1))).astype(jnp.float32)


def _x_from_kernel(X, dtype):
    B = X.shape[0]
    return jnp.transpose(X[:, :, 0:15].reshape(B, D, S, 3),
                         (0, 2, 3, 1)).astype(dtype)


def _ineq_to_kernel(tree):
    B = tree['corr'].shape[0]
    out = jnp.zeros((B, NI, NC), jnp.float32)
    out = out.at[:, :, 0:F].set(
        tree['corr'].reshape(B, NI, F).astype(jnp.float32))
    out = out.at[:, :, 50:62].set(
        tree['box'].reshape(B, NI, 12).astype(jnp.float32))
    return out


def _ineq_from_kernel(arr, dtype):
    B = arr.shape[0]
    return {
        'corr': arr[:, :, 0:F].reshape(B, S, R, F).astype(dtype),
        'box': arr[:, :, 50:62].reshape(B, S, R, 3, 4).astype(dtype),
    }


def _ye_to_kernel(tree):
    flatv = qp.tree_flat({k: tree[k] for k in qp.EQ_KEYS}, qp.EQ_KEYS)
    B, m = flatv.shape
    out = jnp.zeros((B, 1, 128), jnp.float32)
    return out.at[:, 0, :m].set(flatv.astype(jnp.float32))


def _ye_from_kernel(arr, cfg, dtype):
    B = arr.shape[0]
    o = cfg.order
    row = arr[:, 0, :].astype(dtype)
    return {
        'start': row[:, 0:9].reshape(B, 3, 3),
        'end': row[:, 9:18].reshape(B, 3, 3),
        'junc': row[:, 18:18 + (S - 1) * 3 * o].reshape(B, S - 1, 3, o),
    }


def admm_solve_pallas(data, scfg: SolverConfig, x0=None, interpret=False):
    """Drop-in replacement for admm.admm_solve on deploy shapes: the inner
    iteration chunks run in the fused Pallas kernel."""
    from allocnet_tpu.ops import admm as admm_mod

    cfg = data.cfg
    dtype = data.times.dtype
    B = data.times.shape[0]

    beq_tree = qp.eq_rhs(data)
    hh = qp.ineq_rhs(data)

    x = jnp.zeros((B, S, 3, D), dtype) if x0 is None else x0
    z = admm_mod._project(qp.apply_A(data, x), beq_tree, hh)
    y = jax.tree.map(jnp.zeros_like, z)

    rho_i = jnp.full((B,), scfg.rho, jnp.float32)
    rho_e = rho_i * scfg.rho_eq_scale
    sigma = float(scfg.sigma)
    alpha = float(scfg.alpha)

    perm = _dmajor_perm()
    AeqT, Aeqd, beq_row = _pack_eq(data)

    for _ in range(scfg.n_chunks):
        M = qp.normal_matrix(data, sigma, rho_e.astype(dtype),
                             rho_i.astype(dtype))
        Minv = admm_mod.spd_inverse(M)
        eye_pad = jnp.eye(128, dtype=jnp.float32)
        Mp = jnp.tile(eye_pad[None], (B, 1, 1)) \
            .at[:, :120, :120].set(M.astype(jnp.float32))
        Minvp = jnp.tile(eye_pad[None], (B, 1, 1)) \
            .at[:, :120, :120].set(Minv.astype(jnp.float32))
        # permute to d-major flat order and pre-transpose for row matvecs
        MT = Mp[:, perm][:, :, perm].swapaxes(1, 2)
        MinvT = Minvp[:, perm][:, :, perm].swapaxes(1, 2)

        nmat, nmatT, harr, rowmask, rho = _pack_static(data, rho_e, rho_i)
        Xk, zk, yk, yek = run_chunk(
            MinvT, MT, AeqT, Aeqd, nmat, nmatT, harr, rowmask, beq_row, rho,
            _x_to_kernel(x), _ineq_to_kernel(z), _ineq_to_kernel(y),
            _ye_to_kernel(y), scfg.iters_per_chunk, sigma, alpha,
            interpret=interpret)

        x = _x_from_kernel(Xk, dtype)
        zi = _ineq_from_kernel(zk, dtype)
        yi = _ineq_from_kernel(yk, dtype)
        ye = _ye_from_kernel(yek, cfg, dtype)
        z = dict(beq_tree, **zi)
        y = dict(ye, **yi)

        pri, pri_rel, dua, dua_rel = admm_mod._residuals(
            data, x, z, y, beq_tree, hh)
        ratio = jnp.sqrt((pri / jnp.maximum(pri_rel, 1e-12))
                         / jnp.maximum(dua / jnp.maximum(dua_rel, 1e-12),
                                       1e-12)).astype(jnp.float32)
        factor = jnp.clip(ratio, 0.5, 5.0)
        rho_i = jnp.clip(rho_i * factor, 0.25 * scfg.rho, 100.0)
        rho_e = rho_i * scfg.rho_eq_scale

    pri, _, dua, _ = admm_mod._residuals(data, x, z, y, beq_tree, hh)
    return x, z, y, rho_e.astype(dtype), rho_i.astype(dtype), pri, dua
