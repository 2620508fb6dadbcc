#!/bin/bash
# k=20 real-chunk prove campaign (VERDICT round-4 #1, third round running).
#
# Runs scripts/prove_chunk20.py --prove against batch_25/chunk_112 from a
# CODE SNAPSHOT (so concurrent development on the main tree cannot change
# the circuit mid-campaign and invalidate the checkpoint fingerprint),
# retrying on every failure: the phase-level checkpoint turns OOMs and
# tunnel drops into incremental progress, and each retry starts with a
# fresh device arena.
#
# Usage: bash scripts/run_chunk20_campaign.sh [max_attempts] [per_attempt_s]
set -u
REPO=/root/repo
SNAP="$REPO/.chunk20_snap"
LOGDIR="$REPO/outputs/chunk20_r5"
MAX=${1:-10}
PER=${2:-14400}
mkdir -p "$LOGDIR"

if [ ! -d "$SNAP" ]; then
  mkdir -p "$SNAP"
  git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
  # the symlink target must exist or the persistent compile cache
  # silently degrades to cold recompiles on every retry
  mkdir -p "$REPO/.jax_cache"
  ln -sfn "$REPO/.jax_cache" "$SNAP/.jax_cache"
  git -C "$REPO" rev-parse HEAD > "$SNAP/SNAPSHOT_COMMIT"
fi

cd "$SNAP"
for i in $(seq 1 "$MAX"); do
  echo "=== attempt $i/$MAX $(date -u +%H:%M:%S) ===" | tee -a "$LOGDIR/campaign.log"
  timeout "$PER" python scripts/prove_chunk20.py --prove \
    >> "$LOGDIR/attempt_$i.log" 2>&1
  code=$?
  echo "attempt $i exit=$code" | tee -a "$LOGDIR/campaign.log"
  if [ "$code" -eq 0 ]; then
    # copy the proof artifacts back to the main tree's outputs
    cp -r "$SNAP"/outputs/chunk20_* "$REPO/outputs/" 2>/dev/null
    cp "$SNAP"/.bench_cache/chunk20.json "$REPO/.bench_cache/" 2>/dev/null
    echo "CAMPAIGN DONE at attempt $i" | tee -a "$LOGDIR/campaign.log"
    exit 0
  fi
  sleep 45
done
echo "CAMPAIGN EXHAUSTED" | tee -a "$LOGDIR/campaign.log"
exit 1
