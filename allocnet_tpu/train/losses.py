"""Training losses, matching the reference's semantics exactly.

Reference: OsqpLayer.forward/forward4lstm (layers.py:51-247) and the loss
mixing in minsnap_network_conv_lstm.py:371-389 / minsnap_network_conv.py.

Per scenario:
  obj1 = mean predicted time over active segments          (layers.py:85)
  objc = (1/2 x^T Q x) / path_length        [solved only]  (layers.py:149)
  objt = MSE(times, ref_times over active) / seg [unsolved] (layers.py:105)
  padding = MSE(times[seg:], 0)             [MLP head]      (layers.py:93)
  stop    = BCE(tokens, gt) + end_penalty * (#premature + #late)
                                            [LSTM head]     (layers.py:188-205)
  total = w1*obj1 + wc*objc + wp*stop_or_padding   (solved)
        = w1*obj1 + wt*objt + wp*stop_or_padding   (unsolved)

All computed batched & masked (the reference loops per sample).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from allocnet_tpu.config import LossConfig


class LossBundle(NamedTuple):
    total: jax.Array          # scalar
    obj1: jax.Array           # scalar (mean over batch)
    objt: jax.Array
    objc: jax.Array
    stop: jax.Array
    success_rate: jax.Array
    time_segment_accuracy: jax.Array   # fraction with stop loss < 1.0


def stop_token_targets(seg: jax.Array, seq_len: int, dtype=jnp.float32):
    """gt = zeros(seg-1) then ones (layers.py:190-193)."""
    idx = jnp.arange(seq_len)[None, :]
    return (idx >= (seg[:, None] - 1)).astype(dtype)


def stop_token_loss(tokens: jax.Array, seg: jax.Array, lcfg: LossConfig,
                    token_thresh: float = 0.42):
    """BCE + premature/late end penalties (layers.py:195-205). (B,)"""
    T = tokens.shape[1]
    gt = stop_token_targets(seg, T, tokens.dtype)
    eps = 1e-7
    p = jnp.clip(tokens, eps, 1.0 - eps)
    bce = -(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p)).mean(axis=1)
    premature = ((tokens > token_thresh) & (gt < token_thresh)).sum(axis=1)
    late = ((tokens < token_thresh) & (gt > token_thresh)).sum(axis=1)
    return bce + lcfg.end_penalty * (premature + late).astype(tokens.dtype)


def compute_losses(
    lcfg: LossConfig,
    times: jax.Array,        # (B, S) predicted (masked rollout output)
    tokens: jax.Array,       # (B, S) stop tokens (pass None for MLP head)
    seg: jax.Array,          # (B,)
    solved: jax.Array,       # (B,) bool
    obj: jax.Array,          # (B,) QP objective (differentiable)
    state: jax.Array,        # (B, 2, 3, 3)
    ref_times: jax.Array | None = None,   # (B, S) dataset times
    token_thresh: float = 0.42,
) -> LossBundle:
    B, S = times.shape
    dtype = times.dtype
    seg_mask = (jnp.arange(S)[None, :] < seg[:, None]).astype(dtype)
    nseg = jnp.maximum(seg.astype(dtype), 1.0)
    solved_f = solved.astype(dtype)

    obj1 = jnp.sum(times * seg_mask, axis=1) / nseg

    # normalized QP cost; path_length = ||goal - start|| (min_traj_opt.py:145)
    path_len = jnp.maximum(
        jnp.linalg.norm(state[:, 1, :, 0] - state[:, 0, :, 0], axis=-1), 1e-3)
    objc = obj / path_len

    if ref_times is not None:
        objt = (jnp.sum(((times - ref_times) * seg_mask) ** 2, axis=1)
                / nseg / nseg)      # MSE (mean over seg) divided by seg again
    else:
        objt = jnp.zeros((B,), dtype)

    if tokens is not None:
        wp_loss = stop_token_loss(tokens, seg, lcfg, token_thresh)
        accurate = (wp_loss < 1.0).astype(dtype)
    else:
        pad_mask = 1.0 - seg_mask
        denom = jnp.maximum(jnp.sum(pad_mask, axis=1), 1.0)
        wp_loss = jnp.sum((times * pad_mask) ** 2, axis=1) / denom
        accurate = jnp.ones((B,), dtype)

    # branch with `where`, not multiplication: the unsolved branch's objc can
    # be non-finite (diverged infeasible solve) and 0 * nan = nan
    objc = jnp.where(solved, objc, 0.0)
    objt = jnp.where(solved, 0.0, objt)
    per = (lcfg.w1 * obj1 + lcfg.wp * wp_loss
           + lcfg.wc * objc + lcfg.wt * objt)

    return LossBundle(
        total=jnp.mean(per),
        obj1=jnp.mean(obj1),
        objt=jnp.mean((1.0 - solved_f) * objt),
        objc=jnp.mean(solved_f * objc),
        stop=jnp.mean(wp_loss),
        success_rate=jnp.mean(solved_f),
        time_segment_accuracy=jnp.mean(accurate),
    )
