#!/bin/bash
# Poll the host's own process-scaling ceiling (cheap 30s control); start
# the full N-vs-4N measurement only when the host can actually scale
# (control eff >= 0.8) so the run measures the engine, not the neighbors.
cd "$(dirname "$0")/.."
for i in $(seq 1 "${1:-12}"); do
  eff=$(python - <<'PY'
import sys; sys.path.insert(0, ".")
from tools.scaling_bench import cpu_control
print(cpu_control(1)["eff"])
PY
)
  echo "$(date +%H:%M:%S) host control eff=$eff"
  ok=$(python -c "print(1 if float('$eff') >= 0.8 else 0)")
  if [ "$ok" = "1" ]; then
    echo "host healthy - starting measurement"
    exec python tools/scaling_bench.py 600000 1
  fi
  sleep "${2:-600}"
done
echo "host never recovered; no measurement taken"
