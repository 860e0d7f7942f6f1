#!/bin/bash
# TPU session 3 (round 4): transposed-score kernel verdict + B=1 gap work.
# Run AFTER tools/tpu_session.sh + tpu_session2.sh (ONE TPU process at a
# time). NO kills; compiles can take ~10 min each.
cd /root/repo
log=/tmp/tpu_session3.log
echo "=== session3 start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
timeout 900 python - <<'PY' 2>&1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- transposed-score step timing (baseline qf ~1.836 ms) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --large --which qf,qf_trans --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- transposed + deferred KV combo ---" | tee -a $log
python -u tools/probe_layer_kernel.py --large --which qf_trans_defer --lo 16 --hi 144 2>&1 | tee -a $log

echo "=== session3 done $(date -u) ===" | tee -a $log
