#!/bin/bash
# Sequential experiment chain for the single TPU chip (only ONE compile-heavy
# process at a time — see .claude/skills/verify/SKILL.md). Survives the
# driving session dying: launch once with
#   nohup bash scripts/round2_chain.sh > runs/chain.log 2>&1 &
# Each stage is skipped if its terminal artifact already exists, so the chain
# is idempotent and restartable.
set -u
cd /root/repo

wait_for_pid() {
  local pid=$1
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
}

echo "chain start $(date -u +%H:%M:%S)"

# stage 0: wait for the flagship supervised run (started separately)
if [ -f runs/big3/pid.txt ]; then
  wait_for_pid "$(cat runs/big3/pid.txt)"
fi
echo "big3 done $(date -u +%H:%M:%S)"

# stage 1: threshold calibration on big3's val split
if [ ! -f runs/big3/eval_fresh_calibrated.json ]; then
  timeout 5400 python scripts/calibrate_thresh.py --run runs/big3 \
    > runs/big3/calibrate.log 2>&1
  echo "calibrate big3 rc=$? $(date -u +%H:%M:%S)"
fi

# stage 2: QP-gradient fine-tune from the supervised flagship
if [ ! -f runs/finetune/eval_fresh.json ]; then
  mkdir -p runs/finetune
  timeout 14400 python scripts/finetune_qp.py > runs/finetune/train.log 2>&1
  echo "finetune rc=$? $(date -u +%H:%M:%S)"
fi

# stage 3: calibrate the fine-tuned checkpoint too
if [ -f runs/finetune/eval_fresh.json ] && \
   [ ! -f runs/finetune/eval_fresh_calibrated.json ]; then
  timeout 5400 python scripts/calibrate_thresh.py --run runs/finetune \
    > runs/finetune/calibrate.log 2>&1
  echo "calibrate finetune rc=$? $(date -u +%H:%M:%S)"
fi

# stage 4: post-init-fix MLP ablation probe
if [ ! -f runs/ablation/mlp_probe2/results.json ]; then
  mkdir -p runs/ablation/mlp_probe2
  timeout 10800 python scripts/mlp_probe.py \
    > runs/ablation/mlp_probe2/train.log 2>&1
  echo "mlp_probe2 rc=$? $(date -u +%H:%M:%S)"
fi

echo "chain stages 1-4 done $(date -u +%H:%M:%S)"

# stage 5: self-distillation — refine the 100k corpus's time targets
# through the differentiable QP (restartable per-chunk)
if [ -f data/big100k_combined.npz ] && [ ! -f data/big100k_refined.npz ]; then
  timeout 21600 python scripts/refine_targets.py > runs/refine_targets.log 2>&1
  echo "refine_targets rc=$? $(date -u +%H:%M:%S)"
fi

# stage 6: controlled retrain on the refined targets (big3 hyperparams)
if [ -f data/big100k_refined.npz ] && [ ! -f runs/big4/eval_fresh.json ]; then
  mkdir -p runs/big4
  timeout 43200 python scripts/train_big4.py > runs/big4/train.log 2>&1
  echo "train_big4 rc=$? $(date -u +%H:%M:%S)"
fi

echo "chain done (incl. distillation) $(date -u +%H:%M:%S)"
