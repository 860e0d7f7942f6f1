"""Full model lineup benchmark on the real TPU — the flagship evidence.

Per model: full fused pipeline (log-mel -> encoder -> greedy decode of a
FORCED 224 tokens, EOT suppressed), one 30 s clip, int8 weights + the
megakernel decode (kv_mode auto). Timing by value fetch (the tunnel's
block_until_ready does not synchronize). Weights are random at real model
dimensions — RTF is shape-dependent, not value-dependent.

Usage:
    python -u tools/bench_lineup.py                      # default lineup
    python -u tools/bench_lineup.py --emit json > LINEUP_r03.json
    python -u tools/bench_lineup.py large-v3 --batch 8   # one model, B=8

The JSON artifact captures the whole lineup incl. the north-star metric
(large-v3 int8 B=1 RTF vs the 0.02 target) and the B=8 serving point, so
the flagship numbers are reproducible from one committed command.
"""

import argparse
import json
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
NORTH_STAR_RTF = 0.02          # BASELINE.md: large-v3 int8 per-chip target
REFERENCE_TINY_RTF = 0.31      # reference's best validated native number


def bench_model(name: str, batch_size: int = 1, quant: str = "int8") -> dict:
    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.audio.mel import MelFilterbank
    from whisper_apr_tpu.model.params import init_params, quantize_params
    from whisper_apr_tpu.model.qdecode import (prepare_kq_decode,
                                               prepare_q4k_decode,
                                               prepare_qdecode)
    from whisper_apr_tpu.pipeline import fused_transcribe_step, pad_audio_batch

    cfg = ModelConfig.from_name(name)
    params = quantize_params(init_params(cfg, seed=0), quant)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    if quant == "q4k":
        qd = prepare_q4k_decode(params, cfg)
    elif quant in ("q5k", "q6k"):
        qd = prepare_kq_decode(params, cfg)
    else:
        qd = prepare_qdecode(params, cfg)
    if batch_size > 1 and qd is not None \
            and str(qd.get("mode", "int8")) in ("q4k", "q5k", "q6k"):
        # B>1 k-quant serving rides the one-time int8 transcode
        # (qdecode.transcode_kq_to_int8) — the engine's routing
        from whisper_apr_tpu.model.qdecode import transcode_kq_to_int8
        qd = transcode_kq_to_int8(params, cfg) or qd

    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.1, int(16_000 * AUDIO_SECONDS)).astype(np.float32)
    fb = MelFilterbank.create(cfg.n_mels)
    prompt_len = 4
    max_len = prompt_len + DECODE_TOKENS
    prompt = jnp.asarray(np.broadcast_to(
        np.array([[50258, 50259, 50359, 50363]], dtype=np.int32),
        (batch_size, prompt_len)).copy())
    bias = np.zeros(cfg.n_vocab, dtype=np.float32)
    bias[50257] = np.finfo(np.float32).min
    bias = jnp.asarray(bias)
    batch = jnp.asarray(pad_audio_batch([audio] * batch_size, 480_000))

    def pipeline():
        tokens, *_ = fused_transcribe_step(
            params, batch, fb._window, fb._basis, fb._filters_t,
            prompt, bias, 50257, cfg, max_len=max_len,
            prompt_len=prompt_len, compute_dtype=jnp.bfloat16, qd=qd,
            # mirror the production kv_mode "auto" routing: cross8 for
            # single-stream, FULL int8 for B>1 slots (session-7 B=8
            # KV-mode lineup; parallel/serving.py)
            qf_mode="cross8" if batch_size == 1 else "int8")
        return np.asarray(tokens)

    t0 = time.perf_counter()
    pipeline()
    compile_s = time.perf_counter() - t0
    best = min(
        (lambda t0=time.perf_counter(): (pipeline(),
                                         time.perf_counter() - t0)[1])()
        for _ in range(3))
    rtf = best / AUDIO_SECONDS / batch_size
    return {
        "model": name,
        "batch": batch_size,
        "quant": quant,
        "decode_tokens": DECODE_TOKENS,
        "total_ms": round(best * 1e3, 1),
        "rtf_per_stream": round(rtf, 6),
        "realtime_streams_per_chip": round(1.0 / rtf, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="*",
                    default=["tiny", "base", "small", "medium",
                             "large-v3", "large-v3-turbo"])
    ap.add_argument("--emit", choices=["text", "json"], default="text")
    ap.add_argument("--batch", type=int, default=None,
                    help="force one batch size (default: 1, plus 8 for "
                         "large-v3 in the full lineup)")
    ap.add_argument("--quant", default="int8",
                    choices=["int8", "q4k", "q5k", "q6k"],
                    help="weight format (k-quants ride the round-4 fused "
                         "kq blocks at B=1)")
    ap.add_argument("--with-q4k", action="store_true",
                    help="add a large-v3 q4k B=1 row to the full lineup")
    args = ap.parse_args()

    runs = []
    for name in args.models:
        runs.append((name, args.batch or 1, args.quant))
    if args.batch is None and "large-v3" in args.models:
        runs.append(("large-v3", 8, args.quant))  # the serving point
    if args.with_q4k:
        runs.append(("large-v3", 1, "q4k"))

    rows = []
    for name, b, q in runs:
        r = bench_model(name, b, q)
        rows.append(r)
        print(f"# {name:<16} B={b} {q:>4}  {r['total_ms']:8.1f} ms   "
              f"RTF/stream {r['rtf_per_stream']:.5f}", file=sys.stderr,
              flush=True)

    if args.emit == "json":
        north = next((r for r in rows
                      if r["model"] == "large-v3" and r["batch"] == 1
                      and r["quant"] == "int8"), None)
        out = {
            "protocol": ("fused mel+encode+greedy, forced "
                         f"{DECODE_TOKENS} tokens, {AUDIO_SECONDS:.0f}s "
                         "clip, int8 weights, megakernel decode, value-"
                         "fetch timing, best of 3"),
            "device": jax.devices()[0].platform,
            "north_star": {
                "target_rtf": NORTH_STAR_RTF,
                "measured_rtf": north["rtf_per_stream"] if north else None,
                "met": (north["rtf_per_stream"] <= NORTH_STAR_RTF)
                if north else None,
            },
            "reference_tiny_rtf": REFERENCE_TINY_RTF,
            "models": rows,
        }
        print(json.dumps(out, indent=1))
    else:
        for r in rows:
            print(f"{r['model']:<16} B={r['batch']}  {r['total_ms']:8.1f} ms"
                  f"   RTF/stream {r['rtf_per_stream']:.5f}")


if __name__ == "__main__":
    main()
