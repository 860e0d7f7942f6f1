#!/bin/bash
# TPU session 7b (round 5): follow-ups to session 7's adjudications.
#   - Session 7 made FULL int8 KV the B>1 serving default (i8kv 0.778 vs
#     bf16 0.913 ms/slot-token at B=8) — re-run the production-shaped
#     bodies and the tile sweep ON that default (the bf16-KV sweep may
#     not transfer), plus the B=64 knee on the production config.
cd /root/repo
log=/tmp/tpu_session7b.log
echo "=== session7b start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
python - <<'PY' 2>&1 | tail -1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- B=8 on the int8-KV serving default: prod bodies + tile sweep ---" | tee -a $log
python -u tools/probe_layer_kernel.py --batched --b 8 \
    --which qf_prod_i8kv,qf_prodhead_i8kv,bt32_i8kv,bt112_i8kv \
    --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- B=64 capacity knee on int8 KV ---" | tee -a $log
python -u tools/probe_layer_kernel.py --batched --b 64 --which qf_i8kv \
    --lo 16 --hi 80 2>&1 | tee -a $log

echo "=== session7b done $(date -u) ===" | tee -a $log
