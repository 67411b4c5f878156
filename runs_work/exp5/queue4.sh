#!/bin/bash
cd /root/repo
while ! grep -q "QUEUE3_DONE" runs_work/exp5/queue3.log 2>/dev/null; do sleep 15; done
echo "=== lstm_mask2 start $(date +%T) ==="
timeout 2700 python -m kvae_tpu.train.loop --config runs_work/exp5/lstm_mask2.yaml \
  --runs-dir runs_work/exp5/lstm_mask2 > runs_work/exp5/lstm_mask2.out 2>&1
echo "=== lstm_mask2 rc=$? end $(date +%T) ==="
echo QUEUE4_DONE
