#!/bin/bash
cd /root/repo
while ! grep -q "POSTPROTO_DONE" runs_work/postproto.log 2>/dev/null; do sleep 30; done
echo "=== skvae proto20 start $(date +%T) ==="
timeout 3000 python -m kvae_tpu.train.loop --config configs/skvae_ball.yaml \
  --runs-dir runs_work/skvae_proto20 --seed 20 > runs_work/skvae20.out 2>&1
echo "=== skvae proto20 rc=$? ==="
timeout 900 python examples/evaluate.py --run runs_work/skvae_proto20 --checkpoint kvae-best-impute --max-batches 31 >> runs_work/skvae20.out 2>&1
echo SKVAE20_DONE
