#!/bin/bash
# TPU session 6 (round 4): reruns + final evidence refresh.
# Run AFTER session4 -> session5 -> session2 complete (ONE TPU process
# at a time). NO kills; compiles can take ~10 min each.
#
# 1. Admission bench RERUN — the session-4 numbers were invalidated by a
#    full-cache tunnel fetch inside the timed region (fixed in 9e2ca5b).
# 2. Lineup q4k row — if session 5 showed the fused k-quant step beating
#    int8's 1.80 ms, this is the new B=1 large-v3 headline row.
# 3. bench.py spread for the round artifact.
cd /root/repo
log=/tmp/tpu_session6.log
echo "=== session6 start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
python - <<'PY' 2>&1 | tail -1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- q4k fused unpack A/B (i32 measured 2.2289; algebra is default) ---" | tee -a $log
Q4K_UNPACK=algebra python -u tools/probe_layer_kernel.py --q4k --fused --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- fixed-overhead anatomy + cross8 (baseline qf_defer 1.800; fixed pool 0.555) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --large \
    --which qf_loop0,qf_fusedhead,qf_cross8,qf_noglue,qf_novocab,qf_noscatter --lo 16 --hi 144 \
    2>&1 | tee -a $log

echo "--- serving admission RERUN (fixed barrier) ---" | tee -a $log
python -u tools/bench_admission.py large-v3 8 3 2>&1 | tee -a $log

echo "--- lineup: large-v3 q4k B=1 row ---" | tee -a $log
python -u tools/bench_lineup.py large-v3 --quant q4k --emit json \
    > /tmp/lineup_q4k.json 2> >(tee -a $log >&2) \
    && cat /tmp/lineup_q4k.json | tee -a $log

echo "--- bench.py headline x2 ---" | tee -a $log
python -u bench.py 2>&1 | tee -a $log
python -u bench.py 2>&1 | tee -a $log

echo "=== session6 done $(date -u) ===" | tee -a $log
