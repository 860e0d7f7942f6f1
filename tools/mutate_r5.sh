#!/bin/bash
# Round-5 mutation-sweep extension (VERDICT r04 Weak #5): the host-logic
# modules MUTATION.json previously skipped. Sequential (one CPU core);
# each module uses its focused suite; -x inside mutate.py keeps killed
# mutants cheap. Run in background; survivors become killer tests or
# documented __equivalents__.
cd /root/repo
log=/tmp/mutate_r5.log
echo "=== mutate_r5 start $(date -u) ===" | tee -a $log
set -x
python -u tools/mutate.py --max 40 whisper_apr_tpu/parallel/mesh.py \
    tests/test_parallel.py 2>&1 | tee -a $log
python -u tools/mutate.py --max 40 whisper_apr_tpu/inference/processors.py \
    tests/test_model.py tests/test_cli.py 2>&1 | tee -a $log
python -u tools/mutate.py --max 40 whisper_apr_tpu/inference/beam.py \
    tests/test_beam.py 2>&1 | tee -a $log
python -u tools/mutate.py --max 40 whisper_apr_tpu/inference/streaming.py \
    tests/test_streaming.py 2>&1 | tee -a $log
python -u tools/mutate.py --max 40 whisper_apr_tpu/cli/commands.py \
    tests/test_cli.py tests/test_cli_e2e.py 2>&1 | tee -a $log
python -u tools/mutate.py --max 40 whisper_apr_tpu/engine.py \
    tests/test_engine.py 2>&1 | tee -a $log
echo "=== mutate_r5 done $(date -u) ===" | tee -a $log
