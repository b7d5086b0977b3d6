#!/bin/bash
# One-command on-chip measurement sweep (run when the TPU tunnel is up).
# Probes first (cheap), then the component profile, then the bench modes.
# Each stage logs to /tmp/measure_<stage>.log and continues on failure.
set -u
cd "$(dirname "$0")/.."

echo "== probe =="
# the tunneled chip intermittently hangs on fresh connections: retry
ok=0
for i in 1 2 3; do
  timeout 300 python -c "
import jax, time
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((256, 256)); y = (x @ x)
import numpy as np
_ = float(np.asarray(y[0, 0]))
print('TPU_OK', d[0].platform, round(time.time() - t0, 1))
" && { ok=1; break; }
  echo "probe attempt $i hung; retrying"
done
[ "$ok" = 1 ] || { echo "TPU DOWN — aborting"; exit 1; }

echo "== component profile =="
timeout 2400 python tools/profile_step.py 2>&1 | tee /tmp/measure_profile.log

echo "== bench (host plans, default) =="
timeout 2400 python bench.py 2>&1 | tee /tmp/measure_bench.log

echo "== bench (device plans A/B) =="
BENCH_HOST_PLANS=0 timeout 2400 python bench.py 2>&1 | tee /tmp/measure_bench_devplans.log
