#!/bin/bash
# Round-3 prioritized TPU chain (single chip, strictly sequential).
# Launch: nohup bash scripts/round3_chain.sh > runs/chain3.log 2>&1 &
# Idempotent: every stage skips if its terminal artifact exists.
set -u
cd /root/repo

wait_clear() {  # wait for any other compile-heavy TPU job to finish
  while pgrep -f "mlp_probe.py" > /dev/null 2>&1 \
     || pgrep -f "round2_chain.sh" > /dev/null 2>&1; do sleep 60; done
}

echo "round3 chain start $(date -u +%H:%M:%S)"
wait_clear

# stage 1: QP-gradient fine-tune from the supervised flagship (VERDICT #2)
if [ ! -f runs/finetune/eval_fresh.json ]; then
  mkdir -p runs/finetune
  timeout 14400 python scripts/finetune_qp.py > runs/finetune/train.log 2>&1
  echo "finetune rc=$? $(date -u +%H:%M:%S)"
fi

# stage 2: calibrate the fine-tuned checkpoint
if [ -f runs/finetune/eval_fresh.json ] && \
   [ ! -f runs/finetune/eval_fresh_calibrated.json ]; then
  timeout 5400 python scripts/calibrate_thresh.py --run runs/finetune \
    > runs/finetune/calibrate.log 2>&1
  echo "calibrate finetune rc=$? $(date -u +%H:%M:%S)"
fi

# stage 3: full-set (2000) refinement eval (VERDICT #8)
if [ ! -f runs/refine/results_full.json ]; then
  timeout 7200 python scripts/eval_refine.py > runs/refine/full.log 2>&1
  echo "eval_refine full rc=$? $(date -u +%H:%M:%S)"
fi

# stage 4: clean 10 Hz driver measurement (no chip contention)
if [ ! -f runs/drive/latency.json.r3clean ]; then
  timeout 1800 python scripts/drive.py > runs/drive/run_r3b.log 2>&1
  rc=$?
  [ $rc -eq 0 ] && cp runs/drive/latency.json runs/drive/latency.json.r3clean
  echo "drive rc=$rc $(date -u +%H:%M:%S)"
fi

# stage 5: self-distillation target refinement (restartable per-chunk)
if [ -f data/big100k_combined.npz ] && [ ! -f data/big100k_refined.npz ]; then
  timeout 21600 python scripts/refine_targets.py > runs/refine_targets.log 2>&1
  echo "refine_targets rc=$? $(date -u +%H:%M:%S)"
fi

# stage 6: controlled retrain on refined targets
if [ -f data/big100k_refined.npz ] && [ ! -f runs/big4/eval_fresh.json ]; then
  mkdir -p runs/big4
  timeout 43200 python scripts/train_big4.py > runs/big4/train.log 2>&1
  echo "train_big4 rc=$? $(date -u +%H:%M:%S)"
fi

# stage 7: calibrate big4
if [ -f runs/big4/eval_fresh.json ] && \
   [ ! -f runs/big4/eval_fresh_calibrated.json ]; then
  timeout 5400 python scripts/calibrate_thresh.py --run runs/big4 \
    > runs/big4/calibrate.log 2>&1
  echo "calibrate big4 rc=$? $(date -u +%H:%M:%S)"
fi

echo "round3 chain done $(date -u +%H:%M:%S)"
