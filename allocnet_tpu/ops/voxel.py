"""Voxel occupancy map as a dense 3D tensor (TPU-native VoxelMap).

Equivalent of the reference's voxel_map::VoxelMap (voxel_map.hpp:40-228) and
the 26-neighbour dilation macro (voxel_dilater.hpp:26-53), re-designed for
XLA:

  * the grid is a (X, Y, Z) array; point insertion is one scatter;
  * one dilation round == one 3x3x3 max-pool (`lax.reduce_window`), so
    dilate(r) is r fused pools instead of pointer-chasing neighbor lists;
  * the surface ("surf", the shell added by the LAST dilation round —
    voxel_map.hpp:116-161) is a mask difference, extracted as padded point
    arrays for the corridor pipeline.

Out-of-bounds queries return occupied, matching voxel_map.hpp:190-204.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class VoxelGrid(NamedTuple):
    occ: jax.Array        # (X, Y, Z) bool — occupied (incl. dilation)
    surf: jax.Array       # (X, Y, Z) bool — last dilation shell
    origin: jax.Array     # (3,)
    scale: jax.Array      # ()


def voxelize(points: jax.Array, origin, size: tuple[int, int, int],
             scale: float) -> jax.Array:
    """Point cloud (N, 3) -> occupancy (X, Y, Z). Out-of-range points are
    dropped (reference setOccupied bounds check, voxel_map.hpp:98-106)."""
    origin = jnp.asarray(origin, points.dtype)
    ids = jnp.floor((points - origin) / scale).astype(jnp.int32)
    inb = jnp.all((ids >= 0) & (ids < jnp.asarray(size)), axis=1)
    ids = jnp.where(inb[:, None], ids, 0)
    grid = jnp.zeros(size, bool)
    return grid.at[ids[:, 0], ids[:, 1], ids[:, 2]].max(inb)


def _pool26(occ: jax.Array) -> jax.Array:
    """One 26-neighbour dilation round = 3x3x3 max pool."""
    return jax.lax.reduce_window(
        occ, False, jax.lax.bitwise_or,
        window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
        padding='SAME')


def dilate(occ: jax.Array, r: int) -> tuple[jax.Array, jax.Array]:
    """r dilation rounds; returns (dilated occupancy, surf mask).

    surf = cells first marked in round r (voxel_map.hpp:157-160)."""
    if r <= 0:
        return occ, jnp.zeros_like(occ)
    prev = occ
    for _ in range(r - 1):
        prev = _pool26(prev)
    cur = _pool26(prev)
    return cur, cur & ~prev


def voxelize_host(points: np.ndarray, origin, size: tuple[int, int, int],
                  scale: float) -> np.ndarray:
    """Host-side voxelize (NumPy scatter), semantics identical to
    voxelize().  The point count varies per map, so the traced scatter
    recompiles for every new cloud shape — through a tunneled device that
    is minutes per MAP in datagen; the occupancy grid is data prep, not
    differentiable compute, so it belongs on host."""
    pts = np.asarray(points)
    ids = np.floor((pts - np.asarray(origin, pts.dtype)) / scale).astype(
        np.int64)
    inb = np.all((ids >= 0) & (ids < np.asarray(size)), axis=1)
    ids = ids[inb]
    grid = np.zeros(size, bool)
    grid[ids[:, 0], ids[:, 1], ids[:, 2]] = True
    return grid


_dilate_jit = jax.jit(dilate, static_argnums=1)


def make_grid(points, origin, size, scale: float, dilate_r: int) -> VoxelGrid:
    # host scatter (shape-proof) + one fixed-shape jitted dilation per grid
    # size — map builds stopped costing a fresh device compile per cloud
    occ0 = jnp.asarray(voxelize_host(np.asarray(points), origin, size, scale))
    occ, surf = _dilate_jit(occ0, dilate_r)
    return VoxelGrid(occ=occ, surf=surf,
                     origin=jnp.asarray(origin, jnp.float32),
                     scale=jnp.asarray(scale, jnp.float32))


def query(grid: VoxelGrid, pos: jax.Array) -> jax.Array:
    """Batched occupancy query (B, 3) -> (B,) bool; out-of-bounds => True."""
    ids = jnp.floor((pos - grid.origin) / grid.scale).astype(jnp.int32)
    size = jnp.asarray(grid.occ.shape)
    inb = jnp.all((ids >= 0) & (ids < size), axis=-1)
    idc = jnp.clip(ids, 0, size - 1)
    hit = grid.occ[idc[..., 0], idc[..., 1], idc[..., 2]]
    return jnp.where(inb, hit, True)


def surf_points(grid: VoxelGrid, max_points: int) -> tuple[jax.Array, jax.Array]:
    """Surface voxel centers as a fixed-size padded array (M, 3) + mask (M,).

    Center convention: origin + (id + 0.5) * scale (voxel_map.hpp oc)."""
    flat = grid.surf.reshape(-1)
    size = grid.occ.shape
    idx = jnp.argsort(~flat)[:max_points]          # occupied first
    mask = flat[idx]
    ix = idx // (size[1] * size[2])
    iy = (idx // size[2]) % size[1]
    iz = idx % size[2]
    ids = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)
    pts = grid.origin + (ids + 0.5) * grid.scale
    return jnp.where(mask[:, None], pts, 1e9), mask


def surf_points_host(grid: VoxelGrid) -> np.ndarray:
    """Exact (N, 3) surface centers on host (data-gen path)."""
    ids = np.argwhere(np.asarray(grid.surf))
    return np.asarray(grid.origin) + (ids + 0.5) * float(grid.scale)
