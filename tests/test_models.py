"""Network parity vs the shipped TorchScript checkpoints (torch CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allocnet_tpu.models import import_torch, packing
from allocnet_tpu.models.networks import ConvLSTMAllocNet, ConvMLPAllocNet

SHIPPED = "/root/reference/src/planner/models"


def _random_inputs(rng, B=1, seq=5):
    state = rng.normal(size=(B, 9, 2)).astype(np.float32)
    hpolys = rng.normal(size=(B, 50, 4, seq)).astype(np.float32) * 0.5
    return state, hpolys


@pytest.mark.parametrize("name,seq", [
    ("seq5_tokenthresh0_35_cpu", 5),
    ("seq5_rest2rest", 5),
    ("seq10_rest2rest", 10),
])
def test_torchscript_parity(name, seq):
    """Imported weights + masked lax.scan rollout must reproduce the deployed
    TorchScript graph's output times exactly (the TS graph breaks on
    stop > 0.5 and zero-pads; learning_planner.hpp:174-179 reads them)."""
    torch = pytest.importorskip("torch")
    path = f"{SHIPPED}/{name}.pt"
    ts = torch.jit.load(path, map_location="cpu").eval()
    # non-_cpu checkpoints bake device="cuda:0" into the graph; repoint it
    ts.device = torch.device("cpu")

    assert import_torch.seq_len_of_checkpoint(path) == seq
    params = import_torch.load_torchscript_lstm(path)
    net = ConvLSTMAllocNet(seq_len=seq, hidden_size=256, token_thresh=0.5)

    rng = np.random.default_rng(0)
    for trial in range(5):
        state, hpolys = _random_inputs(rng, B=1, seq=seq)
        with torch.no_grad():
            t_out = ts(torch.from_numpy(state[0:1]).reshape(1, 9, 2),
                       torch.from_numpy(hpolys[0:1]))
        times, tokens = net.apply(params, jnp.asarray(state), jnp.asarray(hpolys))
        got = np.asarray(times)[0]
        expect = t_out.numpy().reshape(-1)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5), trial


def test_lstm_batch_equals_single():
    """Batched masked rollout == per-sample rollout."""
    path = f"{SHIPPED}/seq5_rest2rest.pt"
    params = import_torch.load_torchscript_lstm(path)
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    rng = np.random.default_rng(1)
    state, hpolys = _random_inputs(rng, B=8)
    tb, kb = net.apply(params, jnp.asarray(state), jnp.asarray(hpolys))
    for b in range(8):
        t1, k1 = net.apply(params, jnp.asarray(state[b:b + 1]),
                           jnp.asarray(hpolys[b:b + 1]))
        np.testing.assert_allclose(np.asarray(tb)[b], np.asarray(t1)[0],
                                   rtol=1e-5, atol=1e-6)


def test_mlp_shapes_and_positivity():
    net = ConvMLPAllocNet(seg=5, hidden_size=128)
    rng = np.random.default_rng(2)
    state, hpolys = _random_inputs(rng, B=4)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(state),
                      jnp.asarray(hpolys))
    times = net.apply(params, jnp.asarray(state), jnp.asarray(hpolys))
    assert times.shape == (4, 5)
    assert np.all(np.asarray(times) > 0)   # Softplus output


def test_init_fan_in_and_live_slots():
    """Regression for the torch-layout init bug (commit cc115fe): weights are
    stored (out, in) but flax's kaiming default computed fan_in from the
    OUTPUT axis — the MLP time head (5, 256) got std sqrt(2/5) instead of
    sqrt(2/256) (13.8x oversized) and softplus slots were born dead with
    exactly-zero gradient. Locks: (a) init std follows true fan_in, (b) every
    fresh-init time slot is alive across seeds."""
    rng = np.random.default_rng(4)
    state, hpolys = _random_inputs(rng, B=32)
    for seed in range(3):
        net = ConvMLPAllocNet(seg=5, hidden_size=256)
        params = net.init(jax.random.PRNGKey(seed), jnp.asarray(state),
                          jnp.asarray(hpolys))
        w = np.asarray(params["params"]["l3_w"])        # (5, 256)
        assert abs(w.std() - np.sqrt(2 / 256)) < 0.25 * np.sqrt(2 / 256)
        times = np.asarray(net.apply(params, jnp.asarray(state),
                                     jnp.asarray(hpolys),
                                     deterministic=True))
        # a dead slot saturates softplus to ~1e-11 for every input
        assert times.min() > 1e-3, f"dead time slot at init (seed {seed})"

    lstm = ConvLSTMAllocNet(seq_len=5, hidden_size=256)
    lp = lstm.init(jax.random.PRNGKey(0), jnp.asarray(state),
                   jnp.asarray(hpolys))
    w_ih = np.asarray(lp["params"]["w_ih"])             # (1024, 38)
    assert abs(w_ih.std() - np.sqrt(2 / 38)) < 0.25 * np.sqrt(2 / 38)


def test_packing_roundtrip():
    rng = np.random.default_rng(3)
    state = jnp.asarray(rng.normal(size=(4, 2, 3, 3)))
    hp = jnp.asarray(rng.normal(size=(4, 5, 50, 4)))
    np.testing.assert_array_equal(
        np.asarray(packing.unpack_state(packing.pack_state(state))),
        np.asarray(state))
    np.testing.assert_array_equal(
        np.asarray(packing.unpack_hpolys(packing.pack_hpolys(hp))),
        np.asarray(hp))
    # row layout: state[b,0,j,r] -> packed[b, 3j+r, 0]
    packed = np.asarray(packing.pack_state(state))
    np.testing.assert_allclose(packed[1, 3 * 2 + 1, 0],
                               np.asarray(state)[1, 0, 2, 1])
