"""Measure driver cold-process prewarm with the persistent compilation cache.

VERDICT r3 next-step #7: round 3's driver paid 37.8 s of in-process XLA
compile before the first tick.  The deployment fix is the persistent XLA
executable cache (driver.enable_compilation_cache): the first process
populates it, every later cold process deserializes the three compiled tick
programs (cold / warm / rescue) in seconds.  This script runs ONE prewarm in
THIS process and appends the timing to runs/drive/prewarm.json — run it
twice (fresh processes) to record the populate and the cache-hit numbers:

  rm -rf /root/repo/runs/drive/xla_cache
  python scripts/measure_prewarm.py populate
  python scripts/measure_prewarm.py cached
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.models import import_torch
from allocnet_tpu.models.networks import ConvLSTMAllocNet
from allocnet_tpu.planner import driver as driver_lib

OUT = "/root/repo/runs/drive/prewarm.json"
CACHE = "/root/repo/runs/drive/xla_cache"


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    cfg = AllocNetConfig()          # deploy point
    net = ConvLSTMAllocNet(seq_len=5, hidden_size=256, token_thresh=0.5)
    params = jax.tree.map(jnp.asarray, import_torch.load_torchscript_lstm(
        "/root/reference/src/planner/models/seq5_tokenthresh0_35_cpu.pt"))
    drv = driver_lib.Driver(net, params, cfg, rate_hz=10.0, cache_dir=CACHE)
    t0 = time.perf_counter()
    drv.prewarm()
    dt = time.perf_counter() - t0
    entry = {"label": label, "prewarm_s": round(dt, 2),
             "platform": jax.devices()[0].platform,
             "cache_entries": len(os.listdir(CACHE))}
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
