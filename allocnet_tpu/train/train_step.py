"""End-to-end differentiable training step (net -> QP -> loss -> grads).

Replaces the reference's train loop core (minsnap_network_conv_lstm.py:
464-505 train_model + forward_batch), where each sample's QP is solved
serially on host and gradients re-enter through a per-sample autograd hook.
Here the whole batch is one XLA program: conv/LSTM inference, batched ADMM
solve, implicit-KKT backward, Adam update.

Multi-chip: the step is written for jit-with-sharding — shard the batch
arrays over the mesh's 'dp' axis and keep params replicated; XLA inserts the
gradient all-reduce (the explicit-collective variant lives in
parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from allocnet_tpu.config import LossConfig, QPConfig, SolverConfig, TrainConfig
from allocnet_tpu.models import packing
from allocnet_tpu.ops import qp_diff
from allocnet_tpu.train import losses as losses_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def cosine_warm_restarts(lr: float, t0: int, t_mult: int, eta_min: float,
                         total_steps: int = 200_000):
    """torch CosineAnnealingWarmRestarts equivalent via joined cosine
    schedules (reference trainer: train_minsnap_conv_lstm.py scheduler)."""
    schedules, boundaries = [], []
    period, start = t0, 0
    while start < total_steps:
        schedules.append(optax.cosine_decay_schedule(
            init_value=lr, decay_steps=period, alpha=eta_min / lr))
        start += period
        boundaries.append(start)
        period *= max(t_mult, 1)
    return optax.join_schedules(schedules, boundaries[:-1])


def make_optimizer(tcfg: TrainConfig):
    sched = cosine_warm_restarts(tcfg.learning_rate, tcfg.t0, tcfg.t_mult,
                                 tcfg.eta_min)
    return optax.adam(learning_rate=sched)


def init_state(net, tcfg: TrainConfig, sample_state, sample_hpolys) -> TrainState:
    params = net.init(jax.random.PRNGKey(tcfg.seed),
                      packing.pack_state(sample_state),
                      packing.pack_hpolys(sample_hpolys))
    opt = make_optimizer(tcfg)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32))


def loss_fn(params, net, qcfg: QPConfig, scfg: SolverConfig, lcfg: LossConfig,
            state, hpolys, seg, ref_times, token_thresh: float,
            tlb=None):
    out = net.apply(params, packing.pack_state(state),
                    packing.pack_hpolys(hpolys))
    times, tokens = out if isinstance(out, tuple) else (out, None)

    # reference use_time_factor mode (min_traj_opt.py:113-133): the network
    # predicts a factor over the per-segment time lower bound
    if tlb is not None:
        times = tlb * (1.0 + times)

    # floor the active-segment times so the padded QP stays well-posed even
    # for bad early predictions (the reference's unsolved branch handles them)
    S = qcfg.max_seg
    seg_mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(times.dtype)
    times_q = jnp.where(seg_mask > 0, jnp.maximum(times, 0.05), 1.0)

    coeffs, sol = qp_diff.solve(qcfg, scfg, state, hpolys, times_q, seg)
    obj = qp_diff.objective(qcfg, state, hpolys, times_q, seg, coeffs)

    bundle = losses_lib.compute_losses(
        lcfg, times, tokens, seg, sol.solved, obj, state,
        ref_times=ref_times, token_thresh=token_thresh)
    return bundle.total, bundle


def train_step(ts: TrainState, net, tcfg: TrainConfig, qcfg: QPConfig,
               scfg: SolverConfig, lcfg: LossConfig,
               state, hpolys, seg, ref_times, token_thresh: float = 0.42,
               tlb=None):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, bundle), grads = grad_fn(ts.params, net, qcfg, scfg, lcfg,
                                 state, hpolys, seg, ref_times, token_thresh,
                                 tlb)
    opt = make_optimizer(tcfg)
    updates, new_opt = opt.update(grads, ts.opt_state, ts.params)
    new_params = optax.apply_updates(ts.params, updates)
    return TrainState(new_params, new_opt, ts.step + 1), bundle
