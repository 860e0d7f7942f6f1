"""Block-size tuner for the decode megakernels (runs on the real TPU).

Benchmarks self_block / cross_block / ffn_block in isolation, looped over
layers x steps, across candidate tile sizes. Slope timing (see
profile_decode.py) cancels the tunnel's fixed dispatch cost.

Usage: python -u tools/tune_blocks.py [model] [lo] [hi]
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
from profile_decode import P  # noqa: E402  (same directory)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 144
    p = P(lo, hi)

    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model.params import init_params, quantize_params
    from whisper_apr_tpu.model.qdecode import (prepare_qdecode,
                                               quantize_cache)
    from whisper_apr_tpu.model.decoder import init_cache
    from whisper_apr_tpu.ops.decode_blocks import (cross_block, ffn_block,
                                                   self_block)

    cfg = ModelConfig.from_name(model)
    params = init_params(cfg, seed=0)
    params = quantize_params(params, "int8")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    qd = prepare_qdecode(params, cfg)
    blk = qd["blk"]

    B, D, L = 1, cfg.n_text_state, cfg.n_text_layer
    H = blk["w1"].shape[2]
    n_heads = cfg.n_text_head
    enc = jnp.zeros((B, cfg.n_audio_ctx, D), jnp.bfloat16)
    cache = init_cache(params, enc, cfg, max_len=224,
                       compute_dtype=jnp.bfloat16)
    qc = quantize_cache(cache, kv_int8=False)
    x0 = jnp.zeros((B, D), jnp.bfloat16)

    def layers(fn):
        def body(i, env, x):
            return jax.lax.fori_loop(0, L, lambda l, x: fn(env, x, l), x)
        return body

    # ffn_block across block_h
    for bh in (256, 512, 1024):
        if H % bh:
            continue
        try:
            s = p.per_step(layers(
                lambda e, x, l, bh=bh: ffn_block(x, e, l, block_h=bh)),
                blk, x0)
            print(f"ffn_block bh={bh:5d}: {s*1e3:8.4f} ms/step", flush=True)
        except Exception as ex:
            print(f"ffn_block bh={bh}: FAIL {type(ex).__name__}", flush=True)

    # cross_block across block_t (bf16 KV); caches ride in env (a closure
    # would embed them as HLO constants)
    ck, cv = qc.cross_kq, qc.cross_vq
    Tc = ck.shape[2]
    for bt in (256, 512, 768, 1536):
        if Tc % bt:
            continue
        try:
            s = p.per_step(layers(
                lambda e, x, l, bt=bt: cross_block(
                    x, e[0], e[1], None, e[2], None, cfg.n_audio_ctx, l,
                    n_heads, block_t=bt)), (blk, ck, cv), x0)
            print(f"cross_block bt={bt:5d}: {s*1e3:8.4f} ms/step", flush=True)
        except Exception as ex:
            print(f"cross_block bt={bt}: FAIL {type(ex).__name__}: {ex}"[:200],
                  flush=True)

    # self_block across block_t (bf16 KV); pos fixed mid-cache
    sk, sv = qc.self_kq, qc.self_vq
    Ts = sk.shape[2]
    pos = jnp.int32(128)
    for bt in (128, 256):
        if Ts % bt:
            continue
        try:
            s = p.per_step(layers(
                lambda e, x, l, bt=bt: self_block(
                    x, e[0], e[1], None, e[2], None, pos, l, n_heads,
                    block_t=bt)[0]), (blk, sk, sv), x0)
            print(f"self_block bt={bt:5d}: {s*1e3:8.4f} ms/step", flush=True)
        except Exception as ex:
            print(f"self_block bt={bt}: FAIL {type(ex).__name__}", flush=True)


if __name__ == "__main__":
    main()
