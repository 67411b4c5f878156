#!/bin/bash
# T=100 quality experiment matrix (round 5, VERDICT item 1)
cd /root/repo
for arm in lstm_anneal lstm_tight switch_anneal; do
  echo "=== arm $arm start $(date +%T) ==="
  timeout 3600 python -m kvae_tpu.train.loop \
    --config runs_work/exp5/$arm.yaml \
    --runs-dir runs_work/exp5/$arm \
    > runs_work/exp5/$arm.out 2>&1
  echo "=== arm $arm rc=$? end $(date +%T) ==="
done
echo ALL_ARMS_DONE
