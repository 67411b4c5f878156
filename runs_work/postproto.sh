#!/bin/bash
cd /root/repo
while ! grep -q "PROTO_RC=" runs_work/scaling_r5.out 2>/dev/null; do sleep 30; done
R=runs_work/scaling_t100_r5
echo "=== scaling eval start $(date +%T) ==="
timeout 1200 python examples/evaluate.py --run $R --checkpoint kvae-best-impute --max-batches 8 \
  > runs_work/scaling_eval.out 2>&1
echo "eval rc=$?"
timeout 1200 python examples/evaluate.py --run $R --checkpoint kvae-best-pred --max-batches 8 \
  >> runs_work/scaling_eval.out 2>&1
echo "eval-pred rc=$?"
timeout 900 python tools/rollout_figure.py --run $R --checkpoint kvae-best-impute --warmup 8 --steps 72 \
  >> runs_work/scaling_eval.out 2>&1
echo "rollout rc=$?"
echo "=== skvae eval start $(date +%T) ==="
timeout 900 python examples/evaluate.py --run runs_work/skvae_proto10 --checkpoint kvae-best-impute --max-batches 31 \
  > runs_work/skvae_eval.out 2>&1
echo "skvae eval rc=$?"
echo "=== our A/B arm start $(date +%T) ==="
timeout 1500 python -m kvae_tpu.train.loop --config runs_work/ab_r5/ours_config.yaml \
  --runs-dir runs_work/ab_r5/ours > runs_work/ab_r5/ours.out 2>&1
echo "ab ours rc=$?"
echo POSTPROTO_DONE
