#!/bin/bash
# Round-5 training cutoff: at DEADLINE_EPOCH, stop the watchdog + push
# process cleanly (by PID, never by pattern), materialize final/EMA
# checkpoints from the resume file, and let the runbook waiter (which
# waits on the watchdog PID) take the TPU window.
set -u
cd /root/repo
DEADLINE_EPOCH=${1:?usage: r5_cutoff.sh <epoch-seconds>}

while [ "$(date +%s)" -lt "$DEADLINE_EPOCH" ]; do
  WPID=$(cat /tmp/watchdog.pid 2>/dev/null || echo 0)
  kill -0 "$WPID" 2>/dev/null || exit 0   # training already done
  sleep 30
done

WPID=$(cat /tmp/watchdog.pid 2>/dev/null || echo 0)
if kill -0 "$WPID" 2>/dev/null; then
  CPID=$(ps -o pid= --ppid "$WPID" | head -1 | tr -d ' ')
  echo "[cutoff] $(date -u +%H:%M:%S) killing watchdog $WPID push ${CPID:-none}" \
      >> logs/r5_runbook.log
  kill -9 "$WPID" 2>/dev/null
  [ -n "${CPID:-}" ] && kill -9 "$CPID" 2>/dev/null
  sleep 5
fi

PYNQS_PLATFORM=cpu /opt/venv/bin/python - <<'EOF' >> logs/r5_runbook.log 2>&1
import pickle
import numpy as np

src = "checkpoints/fe2s2_r3_dcut64_r5g64_resume.pkl"
with open(src, "rb") as fh:
    ck = pickle.load(fh)
n = len(ck.get("history", ()))
with open("checkpoints/fe2s2_r3_dcut64_r5g64.pkl", "wb") as fh:
    pickle.dump({"params": ck["params"]}, fh)
if ck.get("ema") is not None:
    with open("checkpoints/fe2s2_r3_dcut64_r5g64_ema.pkl", "wb") as fh:
        pickle.dump({"params": ck["ema"]}, fh)
print(f"[cutoff] materialized final(+ema) from {src} at history={n}")
EOF
