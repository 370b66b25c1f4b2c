#!/bin/bash
# Round-5 final window: GFMC rerun (dedup OFF — 65536 overflowed the
# 2048-walker trial block and NaN-poisoned by design), true-f32
# ci_polish consistency test, TB tune at dcut64, prefix sweep, bench.
set -u
cd /root/repo
PY=/opt/venv/bin/python
CKPT=checkpoints/fe2s2_r3_dcut64_r5g64_ema.pkl
FLAGS="--dcut 64 --use-tensor --max-preds 2"
echo "[runbook5] start $(date -u +%H:%M:%S)" >> logs/r5_runbook.log

timeout 1800 $PY scripts/fe2s2_gfmc.py "$CKPT" $FLAGS \
    --n-walkers 2048 --n-iter 400 --p-steps 10 --dedup-max 0 \
    --init-capacity 8192 --tail 200 \
    > logs/r5_gfmc2.log 2>&1
echo "[runbook5] gfmc2 rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log

timeout 2400 $PY scripts/fe2s2_ci_polish.py "$CKPT" $FLAGS \
    --capacity 16384 --m 4096 --k-det 0 --fwd-dtype xla \
    --eloc-batch 128 --ci-chunk 128 \
    > logs/r5_cipolish16k_f32.log 2>&1
echo "[runbook5] cipolish_xla rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log

timeout 900 $PY scripts/tune_fused_tb.py --dcut 64 --tbs 256,512,1024 \
    > logs/r5_tune_tb64.log 2>&1
echo "[runbook5] tune_tb64 rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 1500 $PY scripts/tpu_prefix_sweep.py > logs/r5_prefix_sweep.log 2>&1
echo "[runbook5] prefix_sweep rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 1200 $PY bench.py > logs/r5_bench.log 2>&1
echo "[runbook5] bench rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
echo "[runbook5] DONE $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
