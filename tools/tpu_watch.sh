#!/bin/bash
# Poll the tunneled TPU until compute works, then run the measurement sweep.
# Usage: bash tools/tpu_watch.sh [max_minutes]
set -u
cd "$(dirname "$0")/.."
max_min=${1:-50}
for ((i = 0; i < max_min / 2; i++)); do
  if timeout 110 python -c "
import jax, time, numpy as np
import jax.numpy as jnp
x = jnp.ones((256, 256)); y = (x @ x)
_ = float(np.asarray(y[0, 0]))
print('TPU_OK')
" 2>/dev/null | grep -q TPU_OK; then
    echo "TPU up at $(date -u +%H:%M:%S) — starting sweep"
    exec bash tools/tpu_measure.sh
  fi
  echo "TPU still down at $(date -u +%H:%M:%S) (attempt $((i + 1)))"
  sleep 10
done
echo "TPU never came up within ${max_min} minutes"
exit 1
