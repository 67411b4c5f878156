#!/bin/bash
cd /root/repo
set -e
mkdir -p runs_work/ab_r5
python tools/export_dataset.py --out /tmp/ball5000.npz --num-sequences 5000 --seq-len 20 --seed 0
python tools/make_split.py --n 5000 --val-split 0.2 --seed 10 --batch-size 32 --out /tmp/ab_split.npz
echo "data ready $(date +%T)"
nice -n 19 timeout 19800 python tools/run_reference_train.py \
  --data /tmp/ball5000.npz --epochs 80 --lr 0.007 --seed 10 \
  --split-file /tmp/ab_split.npz --logdir runs_work/ab_r5/reference
echo "REF_AB_DONE rc=$?"
