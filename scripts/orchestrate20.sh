#!/bin/bash
# Round-5 TPU orchestrator: wait for the tunnel, finish the k=17 smoke
# (validates the frozen circuit end-to-end on the chip), then run the
# k=20 chunk_112 campaign, then layer1 compression. Every stage
# checkpoints and resumes; the tunnel is assumed to fail mid-run.
cd /root/repo
LOG=outputs/orchestrator.log
probe() {
  timeout -k 10 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x=jnp.ones((8,),jnp.uint32); np.asarray(x[0])
" >/dev/null 2>&1
}
wait_tunnel() {
  while ! probe; do
    echo "tunnel down $(date -u +%H:%M)" >> $LOG
    sleep 150
  done
  echo "tunnel UP $(date -u +%H:%M)" >> $LOG
}
for i in $(seq 1 40); do
  wait_tunnel
  echo "[smoke $i] start $(date -u +%H:%M)" >> $LOG
  SPT_WATCHDOG_S=1500 timeout 5400 python scripts/prove_chunk20.py --prove --k 17 \
    --fixture /root/reference/integration/tests/extra_traces/batch_5/chunk_5 \
    >> outputs/chunk5_k17_smoke6.log 2>&1
  code=$?
  echo "[smoke $i] exit=$code" >> $LOG
  [ $code -eq 0 ] && break
  sleep 30
done
grep -q '"tier": "prove"' outputs/chunk5_k17_smoke6.log || { echo "SMOKE NEVER PASSED" >> $LOG; exit 1; }
echo "SMOKE PASSED $(date -u +%H:%M)" >> $LOG
bash scripts/run_chunk20_campaign.sh 12 14400 >> $LOG 2>&1
code=$?
echo "campaign exit=$code $(date -u +%H:%M)" >> $LOG
[ $code -ne 0 ] && exit 1
for i in $(seq 1 6); do
  wait_tunnel
  echo "[ladder $i] start $(date -u +%H:%M)" >> $LOG
  SPT_WATCHDOG_S=1800 timeout 14400 python scripts/prove_ladder20.py \
    >> outputs/ladder20.log 2>&1
  code=$?
  echo "[ladder $i] exit=$code" >> $LOG
  [ $code -eq 0 ] && { echo "LADDER DONE" >> $LOG; exit 0; }
  sleep 30
done
exit 1
