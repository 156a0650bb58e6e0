#!/bin/bash
# Rebuild everything under data/ (gitignored, so wiped on environment resets)
# from the committed deterministic generators, then resume the round-2
# experiment chain that depends on it.  Idempotent and restartable: every
# stage skips work whose terminal artifact already exists (gen_dataset.py
# additionally skips per-shard), so it is safe to relaunch after a crash:
#
#   cd /root/repo && nohup bash scripts/regen_data.sh > runs/regen.log 2>&1 &
#
# TPU note: each stage is a compile-heavy single-chip job — the script runs
# them strictly sequentially (see .claude/skills/verify/SKILL.md).
# Budget: ~0.3 s/sample at the certification solver settings, so the two
# 50k corpora are ~4-5 h each on one chip.
set -u
cd /root/repo
mkdir -p data runs

echo "regen start $(date -u +%H:%M:%S)"

# stage 1: the round-1/2 training corpus (seeds 1000+, 30% pillar maps)
if [ ! -f data/big_combined.npz ]; then
  # original corpus: 50k over 200 maps (runs/big/dataset.json)
  timeout 86400 python scripts/gen_dataset.py --out data/big --n 50000 \
    --per-map 250 --seed0 1000 > data/gen_big.log 2>&1
  echo "gen big rc=$? $(date -u +%H:%M:%S)"
  python - <<'EOF'
import glob, sys
sys.path.insert(0, ".")
import numpy as np
from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.train import dataset as ds_lib
cfg = AllocNetConfig()
parts = [ds_lib.read_h5(p, cfg.qp)
         for p in sorted(glob.glob("data/big/shard_*.h5"))]
np.savez("data/big_combined.npz",
         state=np.concatenate([p.state for p in parts]),
         hpolys=np.concatenate([p.hpolys for p in parts]),
         times=np.concatenate([p.times for p in parts]),
         seg=np.concatenate([p.seg for p in parts]))
print("big_combined:", sum(len(p.seg) for p in parts))
EOF
fi

# stage 2: the round-2 extension shards (seeds 2000+, same mix)
if [ ! -f data/big100k_combined.npz ]; then
  # extension corpus: ~50k over ~196 maps seeds 2000+ (runs/big3/dataset.json)
  timeout 86400 python scripts/gen_dataset.py --out data/big_b --n 50000 \
    --per-map 250 --seed0 2000 > data/gen_big_b.log 2>&1
  echo "gen big_b rc=$? $(date -u +%H:%M:%S)"
fi

# stage 3: combined 100k cache (train_big3.py's loader builds it from
# big_combined.npz + big_b shards and writes the cache itself; reuse that
# code path without retraining by importing its loader)
if [ ! -f data/big100k_combined.npz ]; then
  python - <<'EOF'
import glob, sys
sys.path.insert(0, ".")
import numpy as np
from allocnet_tpu.config import AllocNetConfig
from allocnet_tpu.train import dataset as ds_lib
cfg = AllocNetConfig()
z = np.load("data/big_combined.npz")
parts = [[z["state"]], [z["hpolys"]], [z["times"]], [z["seg"]]]
for p in sorted(glob.glob("data/big_b/shard_*.h5")):
    sc = ds_lib.read_h5(p, cfg.qp)
    for lst, a in zip(parts, (sc.state, sc.hpolys, sc.times, sc.seg)):
        lst.append(a)
np.savez("data/big100k_combined.npz",
         state=np.concatenate(parts[0]), hpolys=np.concatenate(parts[1]),
         times=np.concatenate(parts[2]), seg=np.concatenate(parts[3]))
print("big100k_combined:", sum(len(a) for a in parts[3]))
EOF
  echo "combine rc=$? $(date -u +%H:%M:%S)"
fi

# stage 4: the never-seen-map eval cache (seeds 9000+; eval_big.py caches
# to data/eval_fresh.npz on first run, evaluating runs/big in passing)
if [ ! -f data/eval_fresh.npz ]; then
  timeout 21600 python scripts/eval_big.py > runs/regen_eval.log 2>&1
  echo "eval cache rc=$? $(date -u +%H:%M:%S)"
fi

# stage 5: with data back, run the dependent experiment chain
# (calibration -> QP fine-tune -> calibrated eval -> MLP probe)
bash scripts/round2_chain.sh >> runs/chain.log 2>&1
echo "regen done $(date -u +%H:%M:%S)"
