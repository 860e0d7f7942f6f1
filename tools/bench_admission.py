"""Serving admission benchmark: staged per-slot vs fused batched (real TPU).

Times BatchScheduler._fill_slots for a burst of N queued requests in both
admission modes. Admission is a ONE-SHOT host-side sequence of device
dispatches, so what matters (and what this measures) is total wall time
including the ~25 ms/dispatch tunnel cost the fused path amortises:
staged admission pays ~3 dispatches per request (mel, encode, prefill +
cache writes); batched admission pays ONE fused program per prompt-length
group plus one donated slot scatter (parallel/serving.py _admit_batch,
pipeline.fused_admit_step).

The reference admits sessions one message at a time
(src/wasm/worker.rs:38); there is no batched-admission baseline to
compare against — this quantifies the win of doing it at all.

Usage: python -u tools/bench_admission.py [model] [slots] [reps]
  MAXLEN=448 env overrides the scheduler cache reservation.
"""

import os
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])  # repo root when run as tools/x.py
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    n_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    max_len = int(os.environ.get("MAXLEN", "224"))

    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.engine import WhisperApr
    from whisper_apr_tpu.model.params import init_params
    from whisper_apr_tpu.parallel.serving import BatchScheduler, Request

    cfg = ModelConfig.from_name(model)
    params = init_params(cfg, seed=0)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    engine = WhisperApr(cfg, params)
    rng = np.random.default_rng(0)
    prompt = engine.get_initial_tokens("en")

    def drain_queue(sched):
        import queue as _q
        while True:
            try:
                sched._queue.get_nowait()
            except _q.Empty:
                return

    def admit_once(sched, n):
        """Queue n requests, time _fill_slots, then reset slot state."""
        for i in range(n):
            audio = rng.normal(0, 0.1, 16000 * 5 + 160 * i).astype(np.float32)
            sched._queue.put(Request(1000 + i, audio, list(prompt), 4))
        t0 = time.perf_counter()
        sched._fill_slots()
        # force completion of every async device write before stopping the
        # clock (block_until_ready does not synchronize over the tunnel).
        # Slice ON DEVICE first: np.asarray(full_leaf) would pull the whole
        # [L,B,T,D] cache (~150 MB for large-v3) through the tunnel and
        # dominate the measurement by 10+ seconds.
        for leaf in jax.tree_util.tree_leaves(sched._cache):
            np.asarray(leaf.ravel()[0])
        dt = time.perf_counter() - t0
        sched._active[:] = False
        for s in range(sched.n_slots):
            sched._req[s] = None
        sched._completions.clear()
        drain_queue(sched)
        return dt

    results = {}
    for batched in (False, True):
        mode = "batched" if batched else "staged"
        sched = BatchScheduler(engine, n_slots=n_slots, max_len=max_len,
                               batched_admission=batched)
        for n in (1, max(2, n_slots // 2), n_slots):
            if n > n_slots:
                continue
            admit_once(sched, n)  # compile + warm
            best = min(admit_once(sched, n) for _ in range(reps))
            results[(mode, n)] = best
            print(f"{model} {mode:8s} burst={n:2d}: {best * 1e3:8.1f} ms "
                  f"({best * 1e3 / n:7.1f} ms/req)", flush=True)

    for n in sorted({k[1] for k in results}):
        s, b = results.get(("staged", n)), results.get(("batched", n))
        if s and b:
            print(f"burst={n:2d}: batched is {s / b:.2f}x faster "
                  f"({s * 1e3:.0f} -> {b * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
