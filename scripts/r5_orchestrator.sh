#!/bin/bash
# Round-5 single orchestrator: wait until the 07:00 UTC deadline OR
# until training is genuinely done (watchdog pid dead on 3 consecutive
# 60 s checks — a single dead read can be a watchdog swap in
# progress), then stop any remaining training by PID, materialize
# final+EMA checkpoints from the resume file, and run the runbook.
set -u
cd /root/repo
DEADLINE_EPOCH=${1:?usage: r5_orchestrator.sh <epoch-seconds>}

dead_count=0
while [ "$(date +%s)" -lt "$DEADLINE_EPOCH" ] && [ "$dead_count" -lt 3 ]; do
  WPID=$(cat /tmp/watchdog.pid 2>/dev/null || echo 0)
  if [ "$WPID" != 0 ] && kill -0 "$WPID" 2>/dev/null; then
    dead_count=0
  else
    dead_count=$((dead_count + 1))
  fi
  sleep 60
done

WPID=$(cat /tmp/watchdog.pid 2>/dev/null || echo 0)
if [ "$WPID" != 0 ] && kill -0 "$WPID" 2>/dev/null; then
  CPID=$(ps -o pid= --ppid "$WPID" | head -1 | tr -d ' ')
  echo "[orch] $(date -u +%H:%M:%S) deadline: killing watchdog $WPID push ${CPID:-none}" \
      >> logs/r5_runbook.log
  kill -9 "$WPID" 2>/dev/null
  [ -n "${CPID:-}" ] && kill -9 "$CPID" 2>/dev/null
  sleep 5
fi

PYNQS_PLATFORM=cpu /opt/venv/bin/python - <<'EOF' >> logs/r5_runbook.log 2>&1
import pickle

src = "checkpoints/fe2s2_r3_dcut64_r5g64_resume.pkl"
with open(src, "rb") as fh:
    ck = pickle.load(fh)
n = len(ck.get("history", ()))
with open("checkpoints/fe2s2_r3_dcut64_r5g64.pkl", "wb") as fh:
    pickle.dump({"params": ck["params"]}, fh)
if ck.get("ema") is not None:
    with open("checkpoints/fe2s2_r3_dcut64_r5g64_ema.pkl", "wb") as fh:
        pickle.dump({"params": ck["ema"]}, fh)
print(f"[orch] materialized final(+ema) from {src} at history={n}")
EOF

exec bash scripts/r5_runbook.sh
