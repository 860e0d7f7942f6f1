#!/bin/bash
# One patient TPU measurement session (run when the tunnel is healthy).
# NO kills: every stage runs to completion; compiles can take ~10 min each.
# Round-4 order (VERDICT r03 #1): trustworthy evidence FIRST — bench +
# lineup land before the measurement experiments so a mid-session wedge
# costs the least. Artifacts write to a temp file and rename only on
# success (the round-3 `> LINEUP.json` redirect truncated the artifact
# when the tool failed).
cd /root/repo
log=/tmp/tpu_session.log
echo "=== session start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
python - <<'PY' 2>&1 | tail -1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- bench.py headline run 1/3 ---" | tee -a $log
python -u bench.py 2>&1 | tee -a $log

echo "--- lineup regeneration (temp + rename) ---" | tee -a $log
python -u tools/bench_lineup.py --emit json > /tmp/lineup_r04.tmp 2>>$log \
  && python -c "import json; json.load(open('/tmp/lineup_r04.tmp'))" \
  && mv /tmp/lineup_r04.tmp /root/repo/LINEUP_r04.json \
  && echo "LINEUP_r04.json written" | tee -a $log \
  || echo "LINEUP REGENERATION FAILED (artifact untouched)" | tee -a $log

echo "--- deferred KV writes vs interleaved (B=1 qf; baseline 1.836 ms) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --large --which qf,qf_defer --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- encoder remeasure int8/noflash only (GEMM stem; baseline 18.9 ms) ---" | tee -a $log
QUANT=int8 FLASH=0 SKIP_MEL=1 STAGES=1 python -u tools/profile_encoder.py large-v3 2 10 2>&1 | tee -a $log

echo "--- bench.py headline run 2/3 ---" | tee -a $log
python -u bench.py 2>&1 | tee -a $log

echo "--- q4k step + matvec ---" | tee -a $log
python -u tools/probe_layer_kernel.py --q4k --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- q5k step + matvec ---" | tee -a $log
python -u tools/probe_layer_kernel.py --q5k --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- q6k step + matvec ---" | tee -a $log
python -u tools/probe_layer_kernel.py --q6k --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- serving admission: staged vs fused batched ---" | tee -a $log
python -u tools/bench_admission.py large-v3 8 3 2>&1 | tee -a $log

echo "--- batched pipeline scale: B=16 and B=32 (B=8 baseline in LINEUP) ---" | tee -a $log
python -u tools/bench_batch.py large-v3 16 32 2>&1 | tee -a $log

echo "--- bench.py headline run 3/3 ---" | tee -a $log
python -u bench.py 2>&1 | tee -a $log

echo "=== session done $(date -u) ===" | tee -a $log
