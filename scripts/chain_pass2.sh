#!/bin/bash
# Wait for the in-flight regen/chain process to finish, then run the
# (idempotent) round-2 chain again to pick up stages whose first attempt
# crashed (finetune_qp TrainState fix).
set -u
cd /root/repo
while pgrep -f "regen_data.sh" > /dev/null 2>&1 || pgrep -f "round2_chain.sh" > /dev/null 2>&1; do
  sleep 120
done
bash scripts/round2_chain.sh >> runs/chain.log 2>&1
