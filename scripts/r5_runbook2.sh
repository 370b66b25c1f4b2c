#!/bin/bash
# Round-5 runbook stages 2+ on the EMA checkpoint (the canonical eval
# read EMA 0.18 mHa below the final params — the refinement ladder
# starts from the better state).
set -u
cd /root/repo
PY=/opt/venv/bin/python
CKPT=checkpoints/fe2s2_r3_dcut64_r5g64_ema.pkl
FLAGS="--dcut 64 --use-tensor --max-preds 2"
echo "[runbook2] start $(date -u +%H:%M:%S) ckpt=$CKPT" >> logs/r5_runbook.log
# 2. ci_polish capture-mode m-sweep (second independent exact E_VMC
#    reading for the VERDICT #4 reconciliation).  m capped at 8192:
#    the host f64 eigh is O(m^3) (~9 min at 8192 on this 1-core box)
timeout 3000 $PY scripts/fe2s2_ci_polish.py "$CKPT" $FLAGS \
    --capacity 8192 --m 2048,4096,8192 --k-det 0 \
    --eloc-batch 128 --ci-chunk 128 \
    > logs/r5_cipolish.log 2>&1
echo "[runbook] ci_polish rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log

# 3. GFMC with the round-5 Buonaura-Sorella estimator.  2048 walkers:
#    the trial block is W*(1+n_sd) rows in ONE dispatch (16M at 2048,
#    2x the round-4 proven 1024; 8192 walkers = 64M would crash)
timeout 2400 $PY scripts/fe2s2_gfmc.py "$CKPT" $FLAGS \
    --n-walkers 2048 --n-iter 400 --p-steps 10 --dedup-max 65536 \
    --init-capacity 8192 --tail 200 \
    > logs/r5_gfmc.log 2>&1
echo "[runbook] gfmc rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log

# 4. NqsCi training on a heat-bath space grown from the state's own
#    top capture determinants (state-seeded: m=64 at +77 mHa vs
#    HF-seeded m=1024 at +4003 mHa, smoke logs)
timeout 3300 $PY scripts/fe2s2_nqsci_train.py "$CKPT" $FLAGS \
    --m 1024 --seed-dets 256 --eps1 3e-4 --iters 100 --tag nqsci \
    --eloc-batch 256 \
    > logs/r5_nqsci.log 2>&1
echo "[runbook] nqsci rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log

# 4b. judged number for the NqsCi-updated params: capture-mode polish
if [ -f checkpoints/fe2s2_r5_nqsci.pkl ]; then
  timeout 1500 $PY scripts/fe2s2_ci_polish.py checkpoints/fe2s2_r5_nqsci.pkl \
      $FLAGS --capacity 8192 --m 4096 --k-det 0 \
      --eloc-batch 128 --ci-chunk 128 \
      > logs/r5_nqsci_polish.log 2>&1
  echo "[runbook] nqsci_polish rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
fi

# 5. kernel work: pallas pair-select on-chip re-validation, step
#    decomposition at the training config, TB autotune, prefix sweep
timeout 1800 $PY scripts/tpu_pallas_hij_check.py > logs/r5_pallas_hij.log 2>&1
echo "[runbook] pallas_hij rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 1200 $PY scripts/profile_reduce_r4.py > logs/r5_profile_reduce.log 2>&1
echo "[runbook] profile rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 900 $PY scripts/tune_fused_tb.py --dcut 64 --tbs 256,512,1024 \
    > logs/r5_tune_tb64.log 2>&1
echo "[runbook] tune_tb64 rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 900 $PY scripts/tune_fused_tb.py --dcut 48 --tbs 256,512,1024 \
    > logs/r5_tune_tb48.log 2>&1
echo "[runbook] tune_tb48 rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 1500 $PY scripts/tpu_prefix_sweep.py > logs/r5_prefix_sweep.log 2>&1
echo "[runbook] prefix_sweep rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
BENCH_MODE=prefix timeout 900 $PY bench.py > logs/r5_bench_prefix.log 2>&1
echo "[runbook] bench_prefix rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
timeout 1200 $PY bench.py > logs/r5_bench.log 2>&1
echo "[runbook] bench rc=$? $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
echo "[runbook] DONE $(date -u +%H:%M:%S)" >> logs/r5_runbook.log
