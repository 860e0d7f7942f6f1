"""Multi-slot decode throughput benchmark (serving path, real TPU).

Times decode_steps_multi over B slots for large-v3 int8 in three cache
modes: dense scan (decode_step_q), fused bf16 (QKVCache megakernels),
fused int8 (half-memory slots). Slope-timed (see profile_decode.py).

Usage: python -u tools/bench_serving.py [model] [slots] [lo] [hi]
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
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 72

    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.model.params import init_params, quantize_params
    from whisper_apr_tpu.model.qdecode import (decode_step_q, decode_step_qf,
                                               prepare_qdecode,
                                               quantize_cache)
    from whisper_apr_tpu.model.decoder import init_cache

    cfg = ModelConfig.from_name(model)
    params = init_params(cfg, seed=0)
    params = quantize_params(params, "int8")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    qd = prepare_qdecode(params, cfg)

    D = cfg.n_text_state
    enc = jnp.zeros((B, cfg.n_audio_ctx, D), jnp.bfloat16)
    max_len = int(os.environ.get("MAXLEN", "224"))
    cache = init_cache(params, enc, cfg, max_len=max_len,
                       compute_dtype=jnp.bfloat16)
    tok0 = jnp.zeros((B,), jnp.int32)
    # mixed per-slot positions; POS0 spreads them (tile-bounding realism)
    p0 = int(os.environ.get("POS0", "0"))
    pos0 = p0 + jnp.arange(B, dtype=jnp.int32) % 7
    p = P(lo, hi)

    def body_scan(i, env, carry):
        prm, q_d = env
        tok, pos, c = carry
        logits, c = decode_step_q(prm, q_d, tok, pos, c, cfg)
        return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1, c)

    modes = [m for m in os.environ.get("MODES", "scan,bf16,int8").split(",")
             if m]
    if "scan" in modes:
        s = p.per_step(body_scan, (params, qd), (tok0, pos0, cache))
        print(f"scan multi-slot B={B}   : {s*1e3:8.4f} ms/step "
              f"({s*1e3/B:6.4f} ms/slot-token)", flush=True)

    def body_fused(i, env, carry):
        prm, q_d = env
        tok, pos, c = carry
        logits, c = decode_step_qf(prm, q_d, tok, pos, c, cfg)
        return (jnp.argmax(logits, -1).astype(jnp.int32), pos + 1, c)

    import whisper_apr_tpu.model.qdecode as qdec
    bts = [int(x) for x in os.environ.get("BT_SWEEP", "").split(",") if x]
    for mode in ("bf16", "int8", "fp8"):
        if mode not in modes:
            continue
        qc = quantize_cache(cache, mode=mode)
        for bt in (bts or [None]):
            qdec.BATCHED_TILE_T = bt
            s = p.per_step(body_fused, (params, qd), (tok0, pos0, qc))
            print(f"fused({mode}) B={B} bt={bt}: {s*1e3:8.4f} ms/step "
                  f"({s*1e3/B:6.4f} ms/slot-token)", flush=True)
    qdec.BATCHED_TILE_T = None


if __name__ == "__main__":
    main()
