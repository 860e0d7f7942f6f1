"""Encoder profiler: how far is the encoder from its compute floor?

large-v3 encoder ~2.3 TFLOP per 30 s clip vs ~394 bf16 TFLOPs/chip
=> ~6 ms floor. Measures encode (with/without flash attention) and the
mel stage, slope-timed over repeat counts to cancel tunnel dispatch.

Usage: python -u tools/profile_encoder.py [model] [lo] [hi]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_decode import P  # noqa: E402


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    p = P(lo, hi)

    from whisper_apr_tpu.config import ModelConfig, N_FFT, HOP_LENGTH
    from whisper_apr_tpu.audio.mel import MelFilterbank, log_mel_body
    from whisper_apr_tpu.model.encoder import encode
    from whisper_apr_tpu.model.params import init_params, quantize_params

    cfg = ModelConfig.from_name(model)
    only_quant = os.environ.get("QUANT")        # e.g. QUANT=int8
    only_flash = os.environ.get("FLASH")        # "0" / "1"
    skip_mel = os.environ.get("SKIP_MEL") == "1"
    for quant in ("int8", "bf16"):
        if only_quant and quant != only_quant:
            continue
        params = init_params(cfg, seed=0)
        if quant == "int8":
            params = quantize_params(params, "int8")
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

        mel = jnp.zeros((1, 2 * cfg.n_audio_ctx, cfg.n_mels), jnp.float32)

        for flash in (False, True):
            if only_flash is not None and flash != (only_flash == "1"):
                continue
            def body(i, env, x):
                out = encode(env, mel, cfg, jnp.bfloat16, use_flash=flash)
                return x + out[:, 0, :1].astype(jnp.float32)

            s = p.per_step(body, params, jnp.zeros((1, 1), jnp.float32))
            print(f"encoder {quant} flash={flash}: {s*1e3:8.2f} ms",
                  flush=True)

    # stage attribution: conv stem alone / blocks alone / final LN alone,
    # so a remeasure says WHERE the floor gap lives (stem vs block glue)
    if os.environ.get("STAGES") == "1":
        from whisper_apr_tpu.model.encoder import conv_stem, encoder_block
        from whisper_apr_tpu.ops.basic import layer_norm

        params = init_params(cfg, seed=0)
        if (only_quant or "int8") == "int8":
            params = quantize_params(params, "int8")
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
        enc_p = params["encoder"]
        mel = jnp.zeros((1, 2 * cfg.n_audio_ctx, cfg.n_mels), jnp.float32)
        xin = jnp.zeros((1, cfg.n_audio_ctx, cfg.n_text_state), jnp.bfloat16)

        def stem_body(i, env, x):
            # + x keeps the stem loop-carried so XLA can't hoist it
            out = conv_stem((mel + x[0, 0]).astype(jnp.bfloat16),
                            env["conv1"], env["conv2"])
            return x + out[:, 0, :1].astype(jnp.float32)

        s = p.per_step(stem_body, enc_p, jnp.zeros((1, 1), jnp.float32))
        print(f"conv stem alone     : {s*1e3:8.2f} ms", flush=True)

        def blocks_body(i, env, x):
            def body(carry, blk):
                return encoder_block(carry, blk, cfg.n_audio_head), None
            out, _ = jax.lax.scan(body, xin + x[0, 0].astype(jnp.bfloat16),
                                  env["blocks"])
            return x + out[:, 0, :1].astype(jnp.float32)

        s = p.per_step(blocks_body, enc_p, jnp.zeros((1, 1), jnp.float32))
        print(f"blocks alone (x{cfg.n_audio_layer:3d}): {s*1e3:8.2f} ms",
              flush=True)

        def ln_body(i, env, x):
            out = layer_norm(xin + x[0, 0].astype(jnp.bfloat16),
                             env["ln_post"]["w"], env["ln_post"]["b"])
            return x + out[:, 0, :1].astype(jnp.float32)

        s = p.per_step(ln_body, enc_p, jnp.zeros((1, 1), jnp.float32))
        print(f"one LN [1500,D]     : {s*1e3:8.2f} ms", flush=True)

    # mel stage
    if skip_mel:
        return
    fb = MelFilterbank.create(cfg.n_mels)
    audio = jnp.zeros((480_000,), jnp.float32)

    def mel_body(i, env, x):
        m = log_mel_body(audio, env[0], env[1], env[2], N_FFT, HOP_LENGTH)
        return x + m[:1, :1].astype(jnp.float32)

    s = p.per_step(mel_body, (fb._window, fb._basis, fb._filters_t),
                   jnp.zeros((1, 1), jnp.float32))
    print(f"mel (GEMM-DFT)      : {s*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
