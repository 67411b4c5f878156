#!/bin/bash
cd /root/repo
while ! grep -q "SKVAE20_DONE" runs_work/skvae20.log 2>/dev/null; do sleep 20; done
timeout 1800 python /tmp/impute_ms_sweep.py > runs_work/ms_sweep.out 2>&1
echo MS_SWEEP_DONE rc=$?
