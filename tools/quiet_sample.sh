#!/bin/bash
# Probe-gated scaling sampler: only launches a bench.py --scaling
# invocation when the host's steal probe reads quiet (< $2 sec, default
# 0.75), because a 4-core pinned cell needs all four cores quiet at
# once (CLAUDE.md).  Usage: quiet_sample.sh <plans> [probe_max] [n_runs]
set -u
cd "$(dirname "$0")/.."
PLANS="${1:-dgrid}"
PMAX="${2:-0.75}"
NRUNS="${3:-3}"
done=0
tries=0
while [ "$done" -lt "$NRUNS" ] && [ "$tries" -lt 200 ]; do
  tries=$((tries + 1))
  p=$(python - <<'EOF'
import time, numpy as np
a = np.arange(4_000_000, dtype=np.float64) * 1e-7
b = np.zeros_like(a)
t0 = time.time()
for _ in range(30):
    b = np.sqrt(a * a + b) * 0.5
print(round(time.time() - t0, 3))
EOF
)
  ok=$(python -c "print(1 if $p < $PMAX else 0)")
  echo "$(date +%H:%M:%S) probe=$p quiet=$ok (done $done/$NRUNS)"
  if [ "$ok" = "1" ]; then
    python bench.py --scaling --plans "$PLANS" 2>>/tmp/quiet_sample_err.log | tail -1
    done=$((done + 1))
  else
    sleep 45
  fi
done
