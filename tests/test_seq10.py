"""seq10 model family: 10-segment corridors end-to-end.

The reference ships a seq10 checkpoint (seq10_rest2rest.pt) and a seq_len=10
network variant (minsnap_network_conv_lstm.py:67-78); this exercises the
10-segment configuration through import, inference, and the QP."""

import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.models import import_torch, packing
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.utils import scenarios


def test_seq10_pipeline():
    cfg = QPConfig(res=10, max_seg=10)
    scfg = SolverConfig(n_chunks=3, iters_per_chunk=150)
    net = ConvLSTMAllocNet(seq_len=10, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(jnp.asarray, import_torch.load_torchscript_lstm(
        "/root/reference/src/planner/models/seq10_rest2rest.pt"))

    sc = scenarios.random_scenarios(cfg, 4, seed=81, min_seg=2, max_seg=8)
    state = jnp.asarray(sc.state, jnp.float32)
    hpolys = jnp.asarray(sc.hpolys, jnp.float32)
    seg = jnp.asarray(sc.seg)

    times, tokens = net.apply(params, packing.pack_state(state),
                              packing.pack_hpolys(hpolys))
    assert times.shape == (4, 10)
    assert np.all(np.isfinite(np.asarray(times)))

    # solve the 10-segment QP with reference times (net times are OOD here)
    data = qp.build_qp(cfg, state, hpolys, jnp.asarray(sc.times, jnp.float32),
                       seg)
    sol = admm.solve_qp(data, scfg)
    assert int(np.asarray(sol.solved).sum()) >= 3
    # junction continuity on a solved scenario
    b = int(np.where(np.asarray(sol.solved))[0][0])
    from tests.oracle import qp_oracle
    c = np.asarray(sol.coeffs)[b]
    L = int(sc.seg[b])
    for i in range(L - 1):
        for r in range(cfg.order):
            left = c[i] @ qp_oracle.t_state(cfg.order, sc.times[b, i])[r]
            right = c[i + 1] @ qp_oracle.t_state(cfg.order, 0.0)[r]
            np.testing.assert_allclose(left, right, atol=1e-4)
