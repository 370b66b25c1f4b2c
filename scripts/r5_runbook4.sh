#!/bin/bash
# Round-5 runbook, phase 3: ci_polish on the TRUNCATION-FREE capture
# (capacity 16384 -> 131k rows, 0.000% dropped in the canonical eval,
# so the capture-restriction cost that ate the capacity-8192 polish
# vanishes and the eigenvalue is a bound vs the true E_VMC), then the
# kernel stages.  NqsCi (long AD dispatches, crash-risky) runs LAST.
set -u
cd /root/repo
PY=/opt/venv/bin/python
CKPT=checkpoints/fe2s2_r3_dcut64_r5g64_ema.pkl
FLAGS="--dcut 64 --use-tensor --max-preds 2"
echo "[runbook4] start $(date -u +%H:%M:%S)" >> logs/r5_runbook.log

timeout 2400 $PY scripts/fe2s2_ci_polish.py "$CKPT" $FLAGS \
    --capacity 16384 --m 4096 --k-det 0 --fwd-dtype xla \
    --eloc-batch 128 --ci-chunk 128 \
    > logs/r5_cipolish16k_f32.log 2>&1
echo "[runbook4] cipolish16k_f32 rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log


timeout 1800 $PY scripts/tpu_pallas_hij_check.py > logs/r5_pallas_hij.log 2>&1
echo "[runbook4] pallas_hij rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 1200 $PY scripts/profile_reduce_r4.py > logs/r5_profile_reduce.log 2>&1
echo "[runbook4] profile rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 900 $PY scripts/tune_fused_tb.py --dcut 64 --tbs 256,512,1024 \
    > logs/r5_tune_tb64.log 2>&1
echo "[runbook4] tune_tb64 rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 900 $PY scripts/tune_fused_tb.py --dcut 48 --tbs 256,512,1024 \
    > logs/r5_tune_tb48.log 2>&1
echo "[runbook4] tune_tb48 rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 1500 $PY scripts/tpu_prefix_sweep.py > logs/r5_prefix_sweep.log 2>&1
echo "[runbook4] prefix_sweep rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
BENCH_MODE=prefix timeout 900 $PY bench.py > logs/r5_bench_prefix.log 2>&1
echo "[runbook4] bench_prefix rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 1200 $PY bench.py > logs/r5_bench.log 2>&1
echo "[runbook4] bench rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log

timeout 2700 $PY scripts/fe2s2_nqsci_train.py "$CKPT" $FLAGS \
    --m 512 --seed-dets 256 --eps1 3e-4 --iters 50 --tag nqsci \
    --eloc-batch 256 --capacity 2048 \
    > logs/r5_nqsci.log 2>&1
echo "[runbook4] nqsci rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
echo "[runbook4] DONE $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
