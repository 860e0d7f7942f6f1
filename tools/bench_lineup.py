"""Full model lineup benchmark on the real TPU (the BENCH_NOTES table).

Per model: full fused pipeline (log-mel -> encoder -> greedy decode of a
FORCED 224 tokens, EOT suppressed), one 30 s clip, B=1, int8 weights +
the per-block megakernel decode (qf_mode bf16). Timing by value fetch.

Usage: python -u tools/bench_lineup.py [model ...]
"""

import os
import sys
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


def bench_model(name: str) -> float:
    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.audio.mel import MelFilterbank
    from whisper_apr_tpu.model.params import init_params, quantize_params
    from whisper_apr_tpu.model.qdecode import prepare_qdecode
    from whisper_apr_tpu.pipeline import fused_transcribe_step, pad_audio_batch

    cfg = ModelConfig.from_name(name)
    params = quantize_params(init_params(cfg, seed=0), "int8")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    qd = prepare_qdecode(params, cfg)

    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.1, int(16_000 * AUDIO_SECONDS)).astype(np.float32)
    fb = MelFilterbank.create(cfg.n_mels)
    prompt_len = 4
    max_len = prompt_len + DECODE_TOKENS
    prompt = jnp.asarray(
        np.array([[50258, 50259, 50359, 50363]], dtype=np.int32))
    bias = np.zeros(cfg.n_vocab, dtype=np.float32)
    bias[50257] = np.finfo(np.float32).min
    bias = jnp.asarray(bias)
    batch = jnp.asarray(pad_audio_batch([audio], 480_000))

    def pipeline():
        tokens, *_ = fused_transcribe_step(
            params, batch, fb._window, fb._basis, fb._filters_t,
            prompt, bias, 50257, cfg, max_len=max_len,
            prompt_len=prompt_len, compute_dtype=jnp.bfloat16, qd=qd,
            qf_mode="bf16")
        return np.asarray(tokens)

    pipeline()
    best = min(
        (lambda t0=time.perf_counter(): (pipeline(),
                                         time.perf_counter() - t0)[1])()
        for _ in range(3))
    return best


def main():
    models = sys.argv[1:] or ["tiny", "base", "small", "medium", "large-v3"]
    for name in models:
        t = bench_model(name)
        rtf = t / AUDIO_SECONDS
        print(f"{name:<10} {t*1e3:8.1f} ms   RTF {rtf:.5f}", flush=True)


if __name__ == "__main__":
    main()
