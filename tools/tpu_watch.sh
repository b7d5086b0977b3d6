#!/bin/bash
# Poll the tunneled TPU until compute works, then run the measurement sweep.
# Usage: bash tools/tpu_watch.sh [max_minutes]
set -u
cd "$(dirname "$0")/.."
max_min=${1:-50}
probe_log=/tmp/tpu_watch_probe.log
: > "$probe_log"
end=$((SECONDS + max_min * 60))
attempt=0
while ((SECONDS < end)); do
  attempt=$((attempt + 1))
  if timeout 110 python -c "
import jax, time, numpy as np
import jax.numpy as jnp
x = jnp.ones((256, 256)); y = (x @ x)
_ = float(np.asarray(y[0, 0]))
print('TPU_OK')
" 2>>"$probe_log" | grep -q TPU_OK; then
    echo "TPU up at $(date -u +%H:%M:%S) — starting sweep"
    exec bash tools/tpu_measure.sh
  fi
  echo "TPU still down at $(date -u +%H:%M:%S) (attempt ${attempt}); last error:"
  tail -n 2 "$probe_log" | sed 's/^/    /'
  sleep 10
done
echo "TPU never came up within ${max_min} minutes (${attempt} attempts); probe log: ${probe_log}"
exit 1
