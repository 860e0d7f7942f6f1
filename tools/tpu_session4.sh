#!/bin/bash
# TPU session 4 (round 4): the remainder of the measurement queue after
# session 1 died mid-q6k (previous conversation boundary killed the
# probe process at 18:55 UTC). NO kills; compiles can take ~10 min each.
# Order: cheapest/highest-value first so a mid-session wedge costs least.
cd /root/repo
log=/tmp/tpu_session4.log
echo "=== session4 start $(date -u) ===" | tee -a $log

echo "--- health probe (no timeout: a killed client mid-RPC wedges the tunnel) ---" | tee -a $log
python - <<'PY' 2>&1 | tail -1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- q6k step + matvec (lost to session-1 kill) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --q6k --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- transposed-score step timing (session 3 item; baseline qf_defer 1.800 ms) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --large --which qf_trans,qf_trans_defer --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- encoder remeasure int8/noflash (GEMM stem; round-2 baseline 18.9 ms) ---" | tee -a $log
QUANT=int8 FLASH=0 SKIP_MEL=1 STAGES=1 python -u tools/profile_encoder.py large-v3 2 10 2>&1 | tee -a $log

echo "--- serving admission: staged vs fused batched ---" | tee -a $log
python -u tools/bench_admission.py large-v3 8 3 2>&1 | tee -a $log

echo "--- batched pipeline scale: B=16 and B=32 ---" | tee -a $log
python -u tools/bench_batch.py large-v3 16 32 2>&1 | tee -a $log

echo "--- bench.py headline (deferred-KV default now live) ---" | tee -a $log
python -u bench.py 2>&1 | tee -a $log

echo "=== session4 done $(date -u) ===" | tee -a $log

echo "=== chaining streaming-latency session2 ===" | tee -a $log
bash tools/tpu_session2.sh
