"""Batched full-pipeline benchmark: per-stream RTF at B streams/chip.

Full fused pipeline (mel -> encoder -> greedy 224 forced tokens) for B
concurrent 30 s streams, int8 weights + megakernel decode (batched
variants at B>1). Usage: python -u tools/bench_batch.py [model] [B ...]
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

DECODE_TOKENS = 224
AUDIO_SECONDS = 30.0


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    batches = [int(b) for b in sys.argv[2:]] or [8]

    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.audio.mel import MelFilterbank
    from whisper_apr_tpu.model.params import init_params, quantize_params
    from whisper_apr_tpu.model.qdecode import prepare_qdecode
    from whisper_apr_tpu.pipeline import fused_transcribe_step, pad_audio_batch

    cfg = ModelConfig.from_name(model)
    params = quantize_params(init_params(cfg, seed=0), "int8")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    qd = prepare_qdecode(params, cfg)
    fb = MelFilterbank.create(cfg.n_mels)
    rng = np.random.default_rng(0)

    for B in batches:
        audios = [rng.normal(0, 0.1, 480_000).astype(np.float32)
                  for _ in range(B)]
        batch = jnp.asarray(pad_audio_batch(audios, 480_000))
        prompt_len = 4
        max_len = prompt_len + DECODE_TOKENS
        prompt = jnp.asarray(np.tile(
            np.array([[50258, 50259, 50359, 50363]], np.int32), (B, 1)))
        bias = np.zeros(cfg.n_vocab, np.float32)
        bias[50257] = np.finfo(np.float32).min
        bias = jnp.asarray(bias)

        def pipeline():
            tokens, *_ = fused_transcribe_step(
                params, batch, fb._window, fb._basis, fb._filters_t,
                prompt, bias, 50257, cfg, max_len=max_len,
                prompt_len=prompt_len, compute_dtype=jnp.bfloat16,
                qd=qd, qf_mode="bf16")
            return np.asarray(tokens)

        pipeline()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            pipeline()
            best = min(best, time.perf_counter() - t0)
        rtf = best / AUDIO_SECONDS / B
        print(f"{model} B={B}: {best*1e3:8.1f} ms total, per-stream RTF "
              f"{rtf:.5f} ({1/rtf:.0f}x realtime/chip)", flush=True)


if __name__ == "__main__":
    main()
