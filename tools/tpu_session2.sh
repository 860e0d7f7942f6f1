#!/bin/bash
# TPU session 2 (round 4): streaming chunk latency — BASELINE config #4
# (whisper-medium StreamingProcessor, 5 s chunks / 500 ms overlap) through
# the REAL session path and the HTTP /v1/sessions route. Run AFTER
# tools/tpu_session.sh completes (ONE TPU process at a time).
# NO kills: every stage runs to completion; compiles can take ~10 min.
cd /root/repo
# k-quant FUSED step probes first (round-4 headline candidate) — session5
bash tools/tpu_session5.sh
log=/tmp/tpu_session2.log
echo "=== session2 start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
python - <<'PY' 2>&1 | tee -a $log
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- streaming latency: engine path, no reuse ---" | tee -a $log
python -u tools/bench_streaming.py medium 6 24 2>&1 | tee -a $log

echo "--- streaming latency: engine path, token-level prefix reuse ---" | tee -a $log
python -u tools/bench_streaming.py medium 6 24 --reuse 2>&1 | tee -a $log

echo "--- streaming latency: HTTP /v1/sessions, 2 concurrent ---" | tee -a $log
python -u tools/bench_streaming.py medium 6 24 --http 2>&1 | tee -a $log

echo "--- streaming latency: HTTP + concurrent batch traffic ---" | tee -a $log
python -u tools/bench_streaming.py medium 6 24 --http --with-batch 2>&1 | tee -a $log

echo "=== session2 done $(date -u) ===" | tee -a $log
