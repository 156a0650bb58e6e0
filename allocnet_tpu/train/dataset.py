"""HDF5 scenario dataset: reader compatible with the reference layout,
plus a writer (the reference ships only readers — SURVEY.md section 3.3) and
a synthetic-dataset builder.

Reference layout (datasets.py:9-42): file `dataset.h5` with one group
`idx_{i}` per sample holding
    stacked_state  (9, 2)      packed start/end PVA (packing.py)
    stacked_hpolys (50, 4, L)  L = true segment count (padded on read)
    traj_times     (L,)        reference segment durations
Zero-padding to seq_len happens at read time, exactly as the reference pads.

The batched iterator yields scenario-layout arrays (state (B,2,3,3),
hpolys (B,S,F,4), seg (B,), ref_times (B,S)) ready for the train step, with
optional per-host sharding for multi-host data parallelism (the reference's
DataLoader has no sharding story at all).
"""

from __future__ import annotations

import os
from typing import Iterator, NamedTuple

import numpy as np

from allocnet_tpu.config import QPConfig
from allocnet_tpu.utils.scenarios import ScenarioBatch, random_scenarios


class Batch(NamedTuple):
    state: np.ndarray      # (B, 2, 3, 3)
    hpolys: np.ndarray     # (B, S, F, 4)
    seg: np.ndarray        # (B,)
    ref_times: np.ndarray  # (B, S)


def write_h5(path: str, sc: ScenarioBatch) -> None:
    """Write scenarios in the reference's group-per-sample layout."""
    import h5py

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        B = sc.state.shape[0]
        for i in range(B):
            g = f.create_group(f"idx_{i}")
            L = int(sc.seg[i])
            packed_state = sc.state[i].reshape(2, 9).T          # (9, 2)
            packed_hp = sc.hpolys[i, :L].transpose(1, 2, 0)     # (F, 4, L)
            g.create_dataset("stacked_state", data=packed_state)
            g.create_dataset("stacked_hpolys", data=packed_hp)
            g.create_dataset("traj_times", data=sc.times[i, :L])


def read_h5(path: str, cfg: QPConfig, seq_len: int | None = None) -> ScenarioBatch:
    """Read the whole file into padded scenario arrays (reference read +
    padding semantics, datasets.py:25-42)."""
    import h5py

    S = seq_len or cfg.max_seg
    F = cfg.max_faces
    with h5py.File(path, "r") as f:
        n = len(f.keys())
        state = np.zeros((n, 2, 3, 3))
        hpolys = np.zeros((n, S, F, 4))
        times = np.zeros((n, S))
        seg = np.zeros((n,), np.int32)
        for i in range(n):
            g = f[f"idx_{i}"]
            st = np.asarray(g["stacked_state"])            # (9, 2)
            state[i] = st.T.reshape(2, 3, 3)
            hp = np.asarray(g["stacked_hpolys"])           # (F, 4, L)
            L = hp.shape[2]
            hpolys[i, :L] = hp.transpose(2, 0, 1)[:, :F]
            tt = np.asarray(g["traj_times"])
            times[i, :len(tt)] = tt
            seg[i] = L
    return ScenarioBatch(state=state, hpolys=hpolys, times=times, seg=seg)


def build_synthetic(path: str, cfg: QPConfig, n: int, seed: int = 0) -> None:
    """Generate and persist a synthetic corridor dataset (stands in for the
    M3ED crop pipeline until real point clouds are wired through
    planner/sfc.py)."""
    sc = random_scenarios(cfg, n, seed=seed, min_seg=1)
    write_h5(path, sc)


class Loader:
    """Shuffled batched iterator with train/val split and per-host sharding.

    Mirrors the reference trainer's random_split(0.9) + DataLoader(batch 32,
    shuffle) (train_minsnap_conv_lstm.py:108-120) but adds the multi-host
    story: each host sees a disjoint shard of every epoch.
    """

    def __init__(self, sc: ScenarioBatch, batch_size: int = 32,
                 train_ratio: float = 0.9, seed: int = 0,
                 num_hosts: int = 1, host_id: int = 0):
        n = sc.state.shape[0]
        rng = np.random.default_rng(seed)
        perm = rng.permutation(n)
        n_train = int(n * train_ratio)
        self.train_idx = perm[:n_train]
        self.val_idx = perm[n_train:]
        self.sc = sc
        self.batch_size = batch_size
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id

    def _gather(self, idx) -> Batch:
        return Batch(
            state=self.sc.state[idx],
            hpolys=self.sc.hpolys[idx],
            seg=self.sc.seg[idx],
            ref_times=self.sc.times[idx],
        )

    def epoch(self, epoch: int, split: str = "train") -> Iterator[Batch]:
        idx = self.train_idx if split == "train" else self.val_idx
        rng = np.random.default_rng(self.seed + 1000 * epoch)
        order = rng.permutation(len(idx))
        idx = idx[order]
        # host shard: contiguous stripes of the shuffled epoch
        idx = idx[self.host_id::self.num_hosts]
        bs = self.batch_size
        for k in range(len(idx) // bs):
            yield self._gather(idx[k * bs:(k + 1) * bs])


def read_h5_many(paths, cfg: QPConfig, seq_len: int | None = None) -> ScenarioBatch:
    """Concatenate many shard files (scripts/gen_dataset.py layout) into one
    ScenarioBatch; accepts a directory (all *.h5 inside, sorted) or a list."""
    import glob

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(glob.glob(os.path.join(paths, "*.h5")))
        else:
            paths = [paths]
    parts = [read_h5(p, cfg, seq_len) for p in paths]
    return ScenarioBatch(*[np.concatenate([getattr(p, f) for p in parts])
                           for f in ScenarioBatch._fields])
