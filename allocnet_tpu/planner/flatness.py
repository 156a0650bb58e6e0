"""Quadrotor differential-flatness map, pure JAX.

Equivalent of the reference's FlatnessMap (flatness.hpp:54-134 forward).
The reference hand-writes a 120-line reverse-mode adjoint (flatness.hpp:
136-260); here the backward pass is simply `jax.vjp`/`jax.grad` of the
forward function — parity-tested against finite differences — which is the
whole point of writing dynamics in a functional autodiff framework.

Inputs follow the reference: (vel, acc, jerk, psi, dpsi) -> (thrust,
quaternion wxyz, body rate).  Everything is batched over a leading axis and
jit/vmap-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from allocnet_tpu.config import PhysParams


class FlatOutputs(NamedTuple):
    thrust: jax.Array   # (B,)
    quat: jax.Array     # (B, 4) wxyz
    omega: jax.Array    # (B, 3) body rate


def forward(
    phys: PhysParams,
    vel: jax.Array,    # (B, 3)
    acc: jax.Array,    # (B, 3)
    jerk: jax.Array,   # (B, 3)
    psi: jax.Array,    # (B,)
    dpsi: jax.Array,   # (B,)
) -> FlatOutputs:
    m = phys.vehicle_mass
    g = phys.grav_acc
    dh, dv, cp, veps = (phys.horiz_drag, phys.vert_drag,
                        phys.parasitic_drag, phys.speed_smooth)

    # drag-augmented specific force direction (flatness.hpp:71-90)
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1) + veps)
    w_term = 1.0 + cp * speed
    w = w_term[..., None] * vel
    dh_m = dh / m
    gvec = jnp.zeros_like(vel).at[..., 2].set(g)
    zu = acc + dh_m * w + gvec

    zu_norm = jnp.linalg.norm(zu, axis=-1, keepdims=True)
    z = zu / zu_norm

    # time derivative of the unit vector z (reference ng_xx terms,
    # flatness.hpp:91-108): dz = (I - z z^T) dz_in / |zu|
    v_dot_a = jnp.sum(vel * acc, axis=-1)
    dw_term = cp * v_dot_a / speed
    dw = w_term[..., None] * acc + dw_term[..., None] * vel
    dz_in = jerk + dh_m * dw
    dz = (dz_in - z * jnp.sum(z * dz_in, axis=-1, keepdims=True)) / zu_norm

    # collective thrust (flatness.hpp:109-112)
    f_term = m * acc + dv * w + m * gvec
    thrust = jnp.sum(z * f_term, axis=-1)

    # tilt quaternion composed with yaw (flatness.hpp:113-122), wxyz
    tilt_den = jnp.sqrt(2.0 * (1.0 + z[..., 2]))
    tilt0 = 0.5 * tilt_den
    tilt1 = -z[..., 1] / tilt_den
    tilt2 = z[..., 0] / tilt_den
    c_half = jnp.cos(0.5 * psi)
    s_half = jnp.sin(0.5 * psi)
    quat = jnp.stack([
        tilt0 * c_half,
        tilt1 * c_half + tilt2 * s_half,
        tilt2 * c_half - tilt1 * s_half,
        tilt0 * s_half,
    ], axis=-1)

    # body rates (flatness.hpp:123-131)
    c_psi = jnp.cos(psi)
    s_psi = jnp.sin(psi)
    omg_den = z[..., 2] + 1.0
    omg_term = dz[..., 2] / omg_den
    omega = jnp.stack([
        dz[..., 0] * s_psi - dz[..., 1] * c_psi
        - (z[..., 0] * s_psi - z[..., 1] * c_psi) * omg_term,
        dz[..., 0] * c_psi + dz[..., 1] * s_psi
        - (z[..., 0] * c_psi + z[..., 1] * s_psi) * omg_term,
        (z[..., 1] * dz[..., 0] - z[..., 0] * dz[..., 1]) / omg_den + dpsi,
    ], axis=-1)

    return FlatOutputs(thrust=thrust, quat=quat, omega=omega)


def backward(phys: PhysParams, vel, acc, jerk, psi, dpsi,
             thr_grad, quat_grad, omg_grad):
    """Adjoint of `forward` — the autodiff replacement for the reference's
    hand-coded FlatnessMap::backward (flatness.hpp:136-260).

    Returns (vel_grad, acc_grad, jerk_grad, psi_grad, dpsi_grad)."""
    _, vjp = jax.vjp(lambda v, a, j, p, dp: forward(phys, v, a, j, p, dp),
                     vel, acc, jerk, psi, dpsi)
    return vjp(FlatOutputs(thrust=thr_grad, quat=quat_grad, omega=omg_grad))
