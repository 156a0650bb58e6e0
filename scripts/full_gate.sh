#!/bin/bash
# Canonical full test gate (core + slow tiers) with a TRUSTWORTHY exit code.
# VERDICT r4 weak #1: the r4 gate log showed a failing test followed by
# "full gate rc=0" — the ad-hoc wrapper read the rc of `tee`, not pytest.
# This script pipefails, captures pytest's own rc, and refuses to print a
# green line over a red run.
#
#   bash scripts/full_gate.sh [logfile]     # default runs/tests_full_gate.log
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG="${1:-runs/tests_full_gate.log}"
python -m pytest tests/ -q -m 'slow or not slow' 2>&1 | tee "$LOG"
rc=${PIPESTATUS[0]}
echo "full gate rc=$rc" | tee -a "$LOG"
exit "$rc"
