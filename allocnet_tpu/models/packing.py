"""Tensor packing between scenario layout and the reference's network input
layout.

The reference feeds the network:
  * stacked_state (B, 9, 2): rows [px,vx,ax, py,vy,ay, pz,vz,az], columns
    [start, end] — the Eigen column-major from_blob dance in
    learning_planner.hpp:147-160, identical to the HDF5 dataset layout
    (datasets.py:29).
  * stacked_hpolys (B, 50, 4, S): [face, (a0,a1,a2,b), segment], zero padded
    (learning_planner.hpp:161-168, datasets.py:30).

Our canonical scenario layout is state (B, 2, 3, 3) [start/end, axis,
(p,v,a)] and hpolys (B, S, F, 4).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_state(state):
    """(B, 2, 3, 3) -> (B, 9, 2)."""
    B = state.shape[0]
    return state.reshape(B, 2, 9).transpose(0, 2, 1)


def unpack_state(stacked):
    """(B, 9, 2) -> (B, 2, 3, 3)."""
    B = stacked.shape[0]
    return stacked.transpose(0, 2, 1).reshape(B, 2, 3, 3)


def pack_hpolys(hpolys):
    """(B, S, F, 4) -> (B, F, 4, S)."""
    return jnp.transpose(hpolys, (0, 2, 3, 1))


def unpack_hpolys(stacked):
    """(B, F, 4, S) -> (B, S, F, 4)."""
    return jnp.transpose(stacked, (0, 3, 1, 2))
