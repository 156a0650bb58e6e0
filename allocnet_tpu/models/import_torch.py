"""Import the reference's shipped TorchScript checkpoints into JAX params.

The four deployed models (reference src/planner/models/*.pt, loaded by
learning_planner.hpp:58-138) are all ConvLSTM variants; their state_dicts map
1:1 onto ConvLSTMAllocNet's parameter pytree (models/networks.py keeps torch
weight layouts exactly so this is a rename-only copy).
"""

from __future__ import annotations

import numpy as np


# torch state_dict key -> (module path, param name) in ConvLSTMAllocNet
_LSTM_MAP = {
    'output_module.weight_ih_l0': ('w_ih',),
    'output_module.weight_hh_l0': ('w_hh',),
    'output_module.bias_ih_l0': ('b_ih',),
    'output_module.bias_hh_l0': ('b_hh',),
    'tfs_output_layer.weight': ('tf_w',),
    'tfs_output_layer.bias': ('tf_b',),
    'stop_token_output_layer.0.weight': ('stop_w',),
    'stop_token_output_layer.0.bias': ('stop_b',),
    'hpoly_input_module.0.weight': ('hpoly_enc', 'conv_w'),
    'hpoly_input_module.0.bias': ('hpoly_enc', 'conv_b'),
    'hpoly_input_module.5.weight': ('hpoly_enc', 'lin_w'),
    'hpoly_input_module.5.bias': ('hpoly_enc', 'lin_b'),
    'state_input_module.0.weight': ('state_enc', 'conv_w'),
    'state_input_module.0.bias': ('state_enc', 'conv_b'),
    'state_input_module.4.weight': ('state_enc', 'lin_w'),
    'state_input_module.4.bias': ('state_enc', 'lin_b'),
}


def load_torchscript_lstm(path: str, dtype=np.float32) -> dict:
    """TorchScript .pt -> flax params dict for ConvLSTMAllocNet."""
    import torch

    module = torch.jit.load(path, map_location='cpu')
    sd = {k: v.detach().numpy().astype(dtype) for k, v in module.state_dict().items()}

    params: dict = {}
    for tkey, path_keys in _LSTM_MAP.items():
        node = params
        for p in path_keys[:-1]:
            node = node.setdefault(p, {})
        node[path_keys[-1]] = sd[tkey]
    return {'params': params}


def save_params_msgpack(params: dict, path: str) -> None:
    """Write a params pytree as flax msgpack — the torch-free deployment
    artifact (loading TorchScript costs ~12 s of `import torch` alone;
    a cold planner process must not pay it, learning_planner.hpp:58-76)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(params))


def load_params_msgpack(path: str) -> dict:
    """Template-free restore of a params pytree (numpy leaves)."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_params(path: str, dtype=np.float32) -> dict:
    """Load deployment params from either artifact kind: .msgpack (fast,
    torch-free) or TorchScript .pt.  For a .pt with a sibling .msgpack
    cache the cache wins; otherwise the conversion writes one."""
    if path.endswith(".msgpack"):
        return load_params_msgpack(path)
    cache = path + ".msgpack"
    import os
    if os.path.exists(cache):
        return load_params_msgpack(cache)
    params = load_torchscript_lstm(path, dtype)
    try:
        save_params_msgpack(params, cache)
    except OSError:
        pass                      # read-only checkpoint dir: skip the cache
    return params


def seq_len_of_checkpoint(path: str) -> int:
    """The seq10 variant differs only in the hpoly linear input width."""
    import torch

    module = torch.jit.load(path, map_location='cpu')
    w = dict(module.state_dict())['hpoly_input_module.5.weight']
    return 5 if w.shape[1] == 16 else 10
