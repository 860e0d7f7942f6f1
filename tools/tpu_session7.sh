#!/bin/bash
# TPU session 7 (round 5): production-shaped B=1 A/Bs + the batched-gap
# hunt. Run AFTER session6 completes (ONE TPU process at a time).
#
# Session-6 findings this responds to (BENCH_NOTES round 5):
#   - qf_cross8 1.716 vs qf_defer 1.800 ms/step -> cross8 is now the B=1
#     default; confirm in PRODUCTION-shaped bodies (the engine's loop
#     also runs a full log_softmax the plain probes omit).
#   - qf_fusedhead 1.806 ~ baseline -> head neutral in the plain body;
#     qf_prod vs qf_prodhead decides FUSED_GREEDY_HEAD for real.
#   - fixed pool re-decomposed: glue 24us, vocab 92us, loop 9us -> the
#     missing ~0.35 ms is NOT the greedy tail; B=8 anatomy + tile sweep
#     hunt the batched 1.77x-above-floor gap instead.
cd /root/repo
log=/tmp/tpu_session7.log
echo "=== session7 start $(date -u) ===" | tee -a $log

echo "--- health probe ---" | tee -a $log
python - <<'PY' 2>&1 | tail -1 | tee -a $log
import time, numpy as np, jax.numpy as jnp
t0=time.time()
np.asarray(jnp.dot(jnp.ones((128,128), jnp.bfloat16), jnp.ones((128,128), jnp.bfloat16)))
print("probe ok %.1fs" % (time.time()-t0))
PY

echo "--- B=1 production-shaped A/B (decides FUSED_GREEDY_HEAD + confirms cross8) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --large \
    --which qf_prod,qf_prodhead,qf_prod_cross8,qf_prodhead_cross8 \
    --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- B=8 anatomy: fixed-vs-per-layer split of the batched step ---" | tee -a $log
python -u tools/probe_layer_kernel.py --anatomy --anatomy-b 8 --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- B=8 KV-mode lineup: the cross cache is the dominant tick traffic ---" | tee -a $log
python -u tools/probe_layer_kernel.py --batched --b 8 \
    --which qf,qf_cross8,qf_crossf8,qf_fp8,qf_i8kv --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- B=8 variants: tile sweep + prod glue + fused head ---" | tee -a $log
python -u tools/probe_layer_kernel.py --batched --b 8 \
    --which qf_prod,qf_prodhead,bt16,bt32,bt128 --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- B=8 transcoded q4k (the k-quant serving path: target <=1.1x int8) ---" | tee -a $log
python -u tools/probe_layer_kernel.py --batched --b 8 --quant q4k \
    --which qf --lo 16 --hi 144 2>&1 | tee -a $log

echo "--- B=64 capacity knee ---" | tee -a $log
python -u tools/probe_layer_kernel.py --batched --b 64 --which qf --lo 16 --hi 80 2>&1 | tee -a $log

echo "=== session7 done $(date -u) ===" | tee -a $log
