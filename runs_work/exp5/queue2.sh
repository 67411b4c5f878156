#!/bin/bash
cd /root/repo
# wait for the arms driver to move past lstm_tight, then take the chip
while ! grep -q "arm lstm_tight rc" runs_work/exp5/driver2.log 2>/dev/null; do sleep 20; done
# kill the switch_anneal arm + its driver (diagnostic value < chip time)
pkill_pids=$(ps -o pid=,cmd= -e | grep "train.loop --config runs_work/exp5/switch_anneal" | grep -v grep | awk '{print $1}')
drv=$(ps -o pid=,cmd= -e | grep "run_arms.sh" | grep -v grep | awk '{print $1}')
kill $drv $pskill 2>/dev/null; kill $pkill_pids 2>/dev/null
sleep 3
echo "=== lstm_mask start $(date +%T) ==="
timeout 3600 python -m kvae_tpu.train.loop --config runs_work/exp5/lstm_mask.yaml \
  --runs-dir runs_work/exp5/lstm_mask > runs_work/exp5/lstm_mask.out 2>&1
echo "=== lstm_mask rc=$? end $(date +%T) ==="
echo "=== skvae proto10 start $(date +%T) ==="
timeout 3600 python -m kvae_tpu.train.loop --config configs/skvae_ball.yaml \
  --runs-dir runs_work/skvae_proto10 --seed 10 > runs_work/skvae10.out 2>&1
echo "=== skvae proto10 rc=$? end $(date +%T) ==="
echo QUEUE2_DONE
