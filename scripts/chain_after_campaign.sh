#!/bin/bash
# Waits for the k=20 campaign to finish, then runs layer1 compression of
# the inner proof on the TPU (checkpointed + retried, tunnel assumed
# flaky). Companion to run_chunk20_campaign.sh; see orchestrate20.sh for
# the full smoke->campaign->ladder chain.
REPO=/root/repo
LOG="$REPO/outputs/chunk20_r5/campaign.log"
cd "$REPO"
while true; do
  grep -q "CAMPAIGN DONE" "$LOG" 2>/dev/null && break
  grep -q "CAMPAIGN EXHAUSTED" "$LOG" 2>/dev/null && exit 1
  sleep 60
done
echo "[chain] campaign done, starting ladder $(date -u +%H:%M)" >> "$REPO/outputs/ladder20.log"
for i in $(seq 1 6); do
  SPT_WATCHDOG_S=1800 timeout 14400 python scripts/prove_ladder20.py \
    >> "$REPO/outputs/ladder20.log" 2>&1
  code=$?
  echo "[chain] ladder attempt $i exit=$code" >> "$REPO/outputs/ladder20.log"
  [ $code -eq 0 ] && exit 0
  sleep 45
done
exit 1
