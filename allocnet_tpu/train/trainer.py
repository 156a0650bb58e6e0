"""Training manager: epochs, validation, checkpoint/resume, metrics.

Equivalent of the reference's MinSnapNetworkTrainingManager
(train_minsnap_conv_lstm.py:24-332): config-driven training with automatic
resume from the latest checkpoint and per-step scalar metrics.  Differences,
all deliberate:
  * checkpoints are orbax-style msgpack pytrees (params + opt state + step +
    data cursor) instead of torch .pt;
  * metrics go to a JSONL file (TensorBoard-compatible scalars can be
    re-emitted from it) instead of a SummaryWriter;
  * the inner step is the fully batched differentiable QP step
    (train_step.py) — no per-sample host round trips.
"""

from __future__ import annotations

import json
import os
import time
import jax
import jax.numpy as jnp
import numpy as np

from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.train import dataset as ds_lib
from allocnet_tpu.train import train_step as ts_lib


def save_checkpoint(ckpt_dir: str, ts: ts_lib.TrainState, epoch: int,
                    step: int) -> str:
    from flax import serialization

    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": ts.params,
        "opt_state": ts.opt_state,
        "step": np.asarray(ts.step),
        "epoch": np.asarray(epoch),
    }
    path = os.path.join(ckpt_dir, f"checkpoint{step}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [f for f in os.listdir(ckpt_dir)
             if f.startswith("checkpoint") and f.endswith(".msgpack")]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len("checkpoint"):-len(".msgpack")]))
    return os.path.join(ckpt_dir, cands[-1])


def restore_checkpoint(path: str, template: ts_lib.TrainState):
    from flax import serialization

    with open(path, "rb") as f:
        payload = serialization.from_bytes(
            {"params": template.params, "opt_state": template.opt_state,
             "step": np.asarray(template.step), "epoch": np.asarray(0)},
            f.read())
    ts = ts_lib.TrainState(params=payload["params"],
                           opt_state=payload["opt_state"],
                           step=jnp.asarray(payload["step"]))
    return ts, int(payload["epoch"])


class Trainer:
    def __init__(self, cfg: AllocNetConfig, net, loader: ds_lib.Loader,
                 workdir: str, use_mesh: bool | None = None):
        """use_mesh: shard training over all visible devices (data
        parallelism over the scenario batch, params replicated — SURVEY
        section 2.2).  Default: automatic, on whenever >1 device is
        visible.  Semantics are device-count-invariant (the sharded
        step is the SAME jitted program; tests/test_train.py proves
        step-level equivalence, test_trainer_mesh_matches_manual_steps
        proves it end-to-end through Trainer.train)."""
        self.cfg = cfg
        self.net = net
        self.loader = loader
        self.workdir = workdir
        self.ckpt_dir = os.path.join(workdir, "checkpoints")
        self.log_path = os.path.join(workdir, "metrics.jsonl")
        os.makedirs(workdir, exist_ok=True)

        from allocnet_tpu.parallel import mesh as mesh_lib
        if use_mesh is None:
            use_mesh = len(jax.devices()) > 1
        self.mesh = mesh_lib.make_mesh() if use_mesh else None

        sample = loader._gather(loader.train_idx[:2])
        self.ts = ts_lib.init_state(net, cfg.train,
                                    jnp.asarray(sample.state, jnp.float32),
                                    jnp.asarray(sample.hpolys, jnp.float32))
        self.start_epoch = 0
        ck = latest_checkpoint(self.ckpt_dir)
        if ck is not None:
            self.ts, self.start_epoch = restore_checkpoint(ck, self.ts)
        if self.mesh is not None:
            self.ts = mesh_lib.replicate(self.mesh, self.ts)

        c = cfg
        self._step = jax.jit(lambda ts, st, hp, sg, rt: ts_lib.train_step(
            ts, net, c.train, c.qp, c.solver, c.loss, st, hp, sg, rt,
            token_thresh=c.model.token_thresh))
        self._eval = jax.jit(lambda params, st, hp, sg, rt: ts_lib.loss_fn(
            params, net, c.qp, c.solver, c.loss, st, hp, sg, rt,
            c.model.token_thresh))

    # flush buffered step metrics every N steps: converting bundle scalars
    # with float() per step forces a device sync that serializes dispatch
    # (round-1 weak spot; hostile at 50-100k-sample scale).
    log_every: int = 25

    def _log(self, record: dict) -> None:
        with open(self.log_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _flush_steps(self, pending: list) -> None:
        if not pending:
            return
        with open(self.log_path, "a") as f:
            for epoch, step, bundle in pending:
                f.write(json.dumps({
                    "epoch": epoch, "step": step,
                    "obj": float(bundle.total), "obj1": float(bundle.obj1),
                    "objt": float(bundle.objt), "objc": float(bundle.objc),
                    "stop": float(bundle.stop),
                    "success_rate": float(bundle.success_rate),
                    "time_segment_accuracy": float(bundle.time_segment_accuracy),
                }) + "\n")
        pending.clear()

    def _to_dev(self, batch: ds_lib.Batch):
        args = (jnp.asarray(batch.state, jnp.float32),
                jnp.asarray(batch.hpolys, jnp.float32),
                jnp.asarray(batch.seg),
                jnp.asarray(batch.ref_times, jnp.float32))
        if self.mesh is not None:
            n = self.mesh.devices.size
            if batch.state.shape[0] % n == 0:
                from allocnet_tpu.parallel import mesh as mesh_lib
                return mesh_lib.shard_batch(self.mesh, args)
            # a trailing partial batch that does not divide the mesh runs
            # replicated-input (XLA still partitions the compute); keeping
            # it beats dropping samples
        return args

    def train(self, max_epochs: int | None = None) -> ts_lib.TrainState:
        tcfg = self.cfg.train
        epochs = max_epochs or tcfg.max_epochs
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            pending: list = []
            step = int(self.ts.step)
            for batch in self.loader.epoch(epoch, "train"):
                self.ts, bundle = self._step(self.ts, *self._to_dev(batch))
                step += 1
                pending.append((epoch, step, bundle))  # device-side, async
                if len(pending) >= self.log_every:
                    self._flush_steps(pending)
            self._flush_steps(pending)
            # validation (reference: validation loop train_minsnap_conv.py:287-332)
            val = [self._eval(self.ts.params, *self._to_dev(b))[1]
                   for b in self.loader.epoch(epoch, "val")]
            if val:
                self._log({
                    "epoch": epoch, "split": "val",
                    "obj": float(np.mean([float(v.total) for v in val])),
                    "success_rate": float(np.mean([float(v.success_rate) for v in val])),
                })
            if (epoch + 1) % tcfg.save_freq == 0:
                save_checkpoint(self.ckpt_dir, self.ts, epoch + 1,
                                int(self.ts.step))
            self._log({"epoch": epoch, "wall_s": time.time() - t0})
        return self.ts
