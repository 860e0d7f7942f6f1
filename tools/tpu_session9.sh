#!/bin/bash
# TPU session 9 (round 5, conditional): multi-point B=1 anatomy.
# Session 7's B=8 anatomy showed the B=1 "0.555 ms fixed pool" vanishes
# at batch; a 5-point layer sweep + least-squares decides whether the
# B=1 intercept is a real per-step cost (worth engineering) or a
# nonlinearity artifact of the original 2-point fit.
cd /root/repo
log=/tmp/tpu_session9.log
echo "=== session9 start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
python - <<'PY' 2>&1 | tail -1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- B=1 anatomy, 5 layer points ---" | tee -a $log
python -u tools/probe_layer_kernel.py --anatomy --anatomy-layers 4,8,16,24,32 \
    --lo 16 --hi 144 2>&1 | tee -a $log

echo "=== session9 done $(date -u) ===" | tee -a $log
