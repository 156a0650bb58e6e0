"""Deployment export: AOT-lowered inference graph + weights.

TPU-native counterpart of the reference's TorchScript export
(ts_conversion_conv_mlp.py:22-33; the LSTM variant is missing from the
reference repo, SURVEY.md 2 item 21): the inference function is serialized
with `jax.export` (StableHLO, loadable without the Python model code) and the
parameters as a flax msgpack.  `load()` restores a callable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _infer_fn(net):
    def fn(params, stacked_state, stacked_hpolys):
        out = net.apply(params, stacked_state, stacked_hpolys)
        times, tokens = out if isinstance(out, tuple) else (out, None)
        if tokens is None:
            tokens = jnp.ones_like(times)
        return times, tokens
    return fn


def save(path: str, net, params, batch: int = 1, seq_len: int = 5) -> None:
    """Serialize the inference graph (.stablehlo) + params (.msgpack)."""
    from flax import serialization
    from jax import export as jexport

    os.makedirs(path, exist_ok=True)
    fn = _infer_fn(net)
    state = jax.ShapeDtypeStruct((batch, 9, 2), jnp.float32)
    hp = jax.ShapeDtypeStruct((batch, 50, 4, seq_len), jnp.float32)
    params_shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    exported = jexport.export(jax.jit(fn))(params_shapes, state, hp)
    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))


def load(path: str, params_template):
    """Restore (callable, params). The callable takes (params, stacked_state,
    stacked_hpolys) like the original inference fn."""
    from flax import serialization
    from jax import export as jexport

    with open(os.path.join(path, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params_template, f.read())
    return exported.call, params


def save_replan(path: str, net, params, cfg, batch: int = 1) -> None:
    """Serialize the FULL warm-start replanning step (net + batched QP +
    trajectory recovery) as one StableHLO program — the deployment analog of
    the reference's TorchScript-in-C++ serving path (learning_planner.hpp:
    58-138), except the whole planner hot path ships, not just the network.
    """
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    from allocnet_tpu.planner import replan

    os.makedirs(path, exist_ok=True)
    S, D, F = cfg.qp.max_seg, cfg.qp.D, cfg.qp.max_faces

    def step(p, state, hpolys, seg, prev_coeffs, have_prev):
        prev = replan.ReplanState(coeffs=prev_coeffs, have_prev=have_prev)
        times, coeffs, solved, new_prev = replan.replan_step(
            net, p, cfg, state, hpolys, seg, prev)
        return times, coeffs, solved, new_prev.coeffs, new_prev.have_prev

    shapes = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        jax.ShapeDtypeStruct((batch, 2, 3, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, S, F, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch, S, 3, D), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.bool_),
    )
    exported = jexport.export(jax.jit(step))(*shapes)
    with open(os.path.join(path, "replan.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))


def load_replan(path: str, params_template):
    from flax import serialization
    from jax import export as jexport

    with open(os.path.join(path, "replan.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params_template, f.read())
    return exported.call, params
