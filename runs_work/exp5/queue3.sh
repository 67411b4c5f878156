#!/bin/bash
cd /root/repo
while ! grep -q "QUEUE2_DONE" runs_work/exp5/queue2.log 2>/dev/null; do sleep 20; done
rm -rf runs_work/exp5/lstm_mask
echo "=== lstm_mask(rerun) start $(date +%T) ==="
timeout 3600 python -m kvae_tpu.train.loop --config runs_work/exp5/lstm_mask.yaml \
  --runs-dir runs_work/exp5/lstm_mask > runs_work/exp5/lstm_mask.out 2>&1
echo "=== lstm_mask rc=$? end $(date +%T) ==="
echo QUEUE3_DONE
