"""Control-rate trajectory sampling (the 1 kHz process() loop equivalent,
learning_planning.cpp:217-304): trajectory state + flatness outputs at query
times, producing the reference's telemetry (speed, total thrust, tilt angle,
body rate — visualizer.hpp:57-60).

One jitted function evaluates a whole horizon of control ticks at once; a
real-time driver just calls it with the current clock.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from allocnet_tpu.config import PhysParams
from allocnet_tpu.planner import flatness, trajectory


class ControlSample(NamedTuple):
    pos: jax.Array      # (..., 3)
    vel: jax.Array
    acc: jax.Array
    jerk: jax.Array
    thrust: jax.Array   # (...,)
    quat: jax.Array     # (..., 4)
    omega: jax.Array    # (..., 3)
    speed: jax.Array    # (...,)
    tilt: jax.Array     # (...,) radians (from quaternion, like the RViz
                        # tilt_angle topic)


def sample_controls(traj: trajectory.Trajectory, phys: PhysParams,
                    t: jax.Array, psi=None, dpsi=None) -> ControlSample:
    """Evaluate control outputs at global times t (B,) for a trajectory
    batch (B trajectories, one time each)."""
    st = trajectory.eval_state(traj, t, max_deriv=3)   # (B, 4, 3)
    pos, vel, acc, jerk = (st[:, 0], st[:, 1], st[:, 2], st[:, 3])
    B = pos.shape[0]
    psi = jnp.zeros(B, pos.dtype) if psi is None else psi
    dpsi = jnp.zeros(B, pos.dtype) if dpsi is None else dpsi
    out = flatness.forward(phys, vel, acc, jerk, psi, dpsi)
    speed = jnp.linalg.norm(vel, axis=-1)
    q = out.quat
    tilt = jnp.arccos(jnp.clip(1.0 - 2.0 * (q[..., 1] ** 2 + q[..., 2] ** 2),
                               -1.0, 1.0))
    return ControlSample(pos=pos, vel=vel, acc=acc, jerk=jerk,
                         thrust=out.thrust, quat=q, omega=out.omega,
                         speed=speed, tilt=tilt)


def control_horizon(traj: trajectory.Trajectory, phys: PhysParams,
                    rate_hz: float = 1000.0, horizon_s: float = 1.0,
                    t0: float = 0.0) -> ControlSample:
    """All control ticks of a horizon for trajectory 0..B-1 at once
    (B, n_ticks, ...). The reference evaluates these one ROS tick at a time
    (ros::Rate(1000), learning_planning.cpp:314-320)."""
    n = int(rate_hz * horizon_s)
    B = traj.coeffs.shape[0]
    ts = t0 + jnp.arange(n) / rate_hz
    rep = jax.tree.map(lambda a: jnp.repeat(a, n, axis=0), traj)
    flat_t = jnp.tile(ts, B)
    cs = sample_controls(rep, phys, flat_t)
    return jax.tree.map(lambda a: a.reshape((B, n) + a.shape[1:]), cs)
