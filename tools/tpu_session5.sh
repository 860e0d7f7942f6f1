#!/bin/bash
# TPU session 5 (round 4): k-quant FUSED per-block step timings
# (ops/decode_blocks_kq.py — new in round 4). Run AFTER session4+2
# complete (ONE TPU process at a time). NO kills; compiles ~10 min each.
# Baselines: int8 qf_defer 1.800 ms/step; scan-path q4k 5.91 / q5k 3.35 /
# q6k 3.89. Bandwidth math says q4k fused should land ~1.4-1.5 ms (0.75x
# int8 weight bytes) — a new B=1 large-v3 headline if it holds.
cd /root/repo
log=/tmp/tpu_session5.log
echo "=== session5 start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
python - <<'PY' 2>&1 | tail -1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- q4k FUSED step (target: beat int8's 1.800) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --q4k --fused --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- q5k FUSED step ---" | tee -a $log
python -u tools/probe_layer_kernel.py --q5k --fused --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- q6k FUSED step ---" | tee -a $log
python -u tools/probe_layer_kernel.py --q6k --fused --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- step anatomy: fixed vs per-layer (gap hunt for the 0.48 ms) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --anatomy --lo 16 --hi 144 2>&1 | tee -a $log

echo "=== session5 done $(date -u) ===" | tee -a $log
