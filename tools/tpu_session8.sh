#!/bin/bash
# TPU session 8 (round 5): regenerate the round's evidence artifacts AFTER
# session-7 defaults are adjudicated (ONE TPU process at a time).
#   - LINEUP_r05.json: full lineup incl. the q4k B=1 row (atomic write —
#     round 3 shipped a 0-byte artifact from a failed redirect).
#   - bench.py x3 spread (healthy-window discipline: record all three).
cd /root/repo
log=/tmp/tpu_session8.log
echo "=== session8 start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
python - <<'PY' 2>&1 | tail -1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- LINEUP_r05 (full + q4k row) ---" | tee -a $log
python -u tools/bench_lineup.py --emit json --with-q4k > /tmp/LINEUP_r05.tmp \
    2>>$log && python -c "import json;json.load(open('/tmp/LINEUP_r05.tmp'))" \
    && mv /tmp/LINEUP_r05.tmp LINEUP_r05.json \
    && echo "LINEUP_r05.json written" | tee -a $log

echo "--- bench.py spread x3 ---" | tee -a $log
for i in 1 2 3; do python bench.py 2>>$log | tee -a $log; done

echo "=== session8 done $(date -u) ===" | tee -a $log
