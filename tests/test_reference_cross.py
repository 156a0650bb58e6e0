"""Cross-validation against the reference's OWN Python implementation.

Runs the reference's MinTrajOpt matrix assembly (network/utils/
min_traj_opt.py, torch) on the same scenario and compares the dense
(Q, A, b, G, h) against our NumPy oracle — closing the loop
"our oracle == the reference's code", not just "== our reading of it".

Skipped when the reference checkout or torch is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

from allocnet_tpu.config import QPConfig
from allocnet_tpu.utils import scenarios
from tests.oracle import qp_oracle

REF = "/root/reference/network"


def _load_reference_mintrajopt():
    """Import the reference module with its unavailable deps stubbed
    (cvxpy/osqp/memory_profiler are imported at module top but unused by the
    assembly path)."""
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")

    for name in ("cvxpy", "osqp"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "memory_profiler" not in sys.modules:
        mp = types.ModuleType("memory_profiler")
        mp.profile = lambda f: f
        sys.modules["memory_profiler"] = mp

    sys.path.insert(0, REF)
    try:
        import importlib
        utils_pkg = types.ModuleType("utils")
        utils_pkg.__path__ = [os.path.join(REF, "utils")]
        sys.modules.setdefault("utils", utils_pkg)
        spec = importlib.util.spec_from_file_location(
            "utils.min_traj_opt", os.path.join(REF, "utils", "min_traj_opt.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod, torch
    finally:
        sys.path.remove(REF)


@pytest.mark.parametrize("order", [3, 4])
def test_reference_assembly_matches_oracle(order):
    mto_mod, torch = _load_reference_mintrajopt()

    cfg = QPConfig(order=order, res=10, max_vel=4.0, max_acc=6.0)
    sc = scenarios.random_scenarios(cfg, 2, seed=101, min_seg=2)

    params = {
        "planning": {"order": order, "state_dim": 3, "dim": 3, "res": cfg.res,
                     "use_time_factor": False},
        "physical_limits": {"max_vel": cfg.max_vel, "max_acc": cfg.max_acc,
                            "max_jerk": 12.0},
        "phase1_physical_limits": {"max_vel": cfg.max_vel,
                                   "max_acc": cfg.max_acc,
                                   "max_jerk": 10.0, "inf_dis": 0.1},
    }

    for b in range(2):
        L = int(sc.seg[b])
        mto = mto_mod.MinTrajOpt(params)

        # reference input layout: state (9, 2) rows px,vx,ax,...; hpolys
        # (F, 4, S) zero-padded (datasets.py:29-30)
        state_t = torch.tensor(sc.state[b].reshape(2, 9).T)
        hp = np.zeros((cfg.max_faces, 4, cfg.max_seg))
        for i in range(L):
            hp[:, :, i] = sc.hpolys[b, i]
        hp_t = torch.tensor(hp)
        tf_t = torch.tensor(sc.times[b])

        # phase=2 -> fill_ineq (the deployed constraint set)
        mto.update(state_t, hp_t, tf_t, phase=2, seq_len=cfg.max_seg)
        Qr, Ar, br, G1r, h1r, G2r, h2r = [p.detach().numpy() if hasattr(p, "detach")
                                          else p for p in mto.params]

        hlist = [sc.hpolys[b, i][np.linalg.norm(sc.hpolys[b, i, :, :3],
                                                axis=1) > 1e-6]
                 for i in range(L)]
        Q, A, bb, G, h = qp_oracle.assemble(
            order, cfg.res, sc.state[b, 0], sc.state[b, 1], hlist,
            sc.times[b, :L], cfg.max_vel, cfg.max_acc)

        np.testing.assert_allclose(Qr, Q, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(Ar, A, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(br, bb, rtol=1e-6, atol=1e-8)
        # the reference splits inequalities into corridor (G1) and box (G2)
        # streams while the oracle interleaves per (segment, sample) — compare
        # as row sets via sorted lexicographic order
        mine = np.concatenate([G, h[:, None]], axis=1)
        ref = np.concatenate([
            np.concatenate([G1r, h1r[:, None]], axis=1),
            np.concatenate([G2r, h2r[:, None]], axis=1)])
        mine_sorted = mine[np.lexsort(mine.T[::-1])]
        ref_sorted = ref[np.lexsort(ref.T[::-1])]
        np.testing.assert_allclose(mine_sorted, ref_sorted,
                                   rtol=1e-6, atol=1e-8)
