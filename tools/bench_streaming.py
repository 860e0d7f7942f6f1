"""Streaming chunk-latency benchmark (BASELINE.md target row: p50 chunk
latency, whisper-medium, 5 s chunks / 500 ms overlap, real-time partials).

Drives the REAL session path (inference/streaming.StreamingSession — the
same object behind the HTTP /v1/sessions route) with synthetic 16 kHz
audio pushed in 500 ms blocks, and reports p50/p95 wall latency for:

  - chunk->final:   the push() call that emits a "chunk" result (one fused
                    mel+encode+decode program per chunk)
  - chunk->partial: each get_partial() decode of the accumulating buffer
                    (--reuse switches on token-level prefix reuse —
                    engine.transcribe_prefixed)

Weights are random-init (shape-dependent timing only, like every tool in
this directory). Usage:
    python -u tools/bench_streaming.py [model] [n_chunks] [max_tokens]
        [--reuse] [--no-partials]

Reference counterpart: StreamingConfig latency presets
(/root/reference/src/audio/streaming.rs:146,177) exist to hit latency
targets; the reference publishes decoder latency (707.55 ms for 1.5 s,
book/src/performance/benchmarks.md:74) but no streaming p50 — this tool
pins ours.
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

CHUNK_S = 5.0      # BASELINE config #4
OVERLAP_S = 0.5
PUSH_S = 0.5       # feed in 500 ms blocks (mic-like cadence)
SR = 16_000


def pctl(xs, p):
    if not xs:
        return float("nan")
    xs = sorted(xs)
    k = min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))
    return xs[k]


def run_http(eng, n_chunks: int, n_sessions: int, with_batch: bool) -> None:
    """chunk->event latency through the REAL HTTP /v1/sessions route
    (single-thread mode: the audio POST pumps the device loop inline, so
    its round-trip time IS the chunk latency + HTTP overhead), optionally
    with concurrent batch traffic via async /v1/transcribe jobs."""
    import json
    import threading
    import urllib.request

    from whisper_apr_tpu.cli.serve import TranscribeServer

    port = 18791
    server = TranscribeServer(eng, port=port, n_slots=2, single_thread=True)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    for _ in range(200):
        try:
            urllib.request.urlopen(base + "/healthz", timeout=2)
            break
        except OSError:
            time.sleep(0.1)

    def post(path, data=b"", timeout=1200.0, headers=None):
        req = urllib.request.Request(base + path, data=data,
                                     headers=headers or {})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    sids = [post(f"/v1/sessions?language=en&rate={SR}")["session"]
            for _ in range(n_sessions)]
    rng = np.random.default_rng(1)
    push_n = int(PUSH_S * SR)

    def speech_like(n, t0=0.0):
        # modulated tone: enough sustained energy for the default VAD
        # (the HTTP route uses the standard preset, vad on)
        t = t0 + np.arange(n) / SR
        return (0.3 * np.sin(2 * np.pi * 220 * t)
                * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))
                ).astype("<f4")
    push_ms, chunk_events = [], 0
    nxt = {s: 0 for s in sids}
    pushes = 0
    # default StreamingConfig chunks are 5 s / 500 ms — the BASELINE shape
    while chunk_events < n_chunks * n_sessions and pushes < n_chunks * 80:
        if with_batch and pushes % 10 == 0:
            audio = rng.normal(0, 0.1, 16000).astype("<f4")
            post("/v1/transcribe?language=en&max_tokens=8&async=1",
                 audio.tobytes(), headers={"X-Sample-Format": "f32le"})
        for s in sids:
            blk = speech_like(push_n, t0=pushes * PUSH_S).tobytes()
            t0 = time.perf_counter()
            post(f"/v1/sessions/{s}/audio", blk)
            ev = post(f"/v1/sessions/{s}/events?since={nxt[s]}", None)
            dt = (time.perf_counter() - t0) * 1e3
            nxt[s] = ev["next"]
            got = sum(1 for e in ev["events"] if e["kind"] == "chunk")
            if got:
                push_ms.append(dt)
                chunk_events += got
        pushes += 1
    server.shutdown()
    # skip the first chunk per session: it pays the compile
    trimmed = sorted(push_ms)[: max(0, len(push_ms) - n_sessions)] \
        if len(push_ms) > n_sessions else push_ms
    print(f"\nHTTP /v1/sessions ({n_sessions} concurrent"
          f"{', with batch traffic' if with_batch else ''}): "
          f"{chunk_events} chunk events")
    print(f"chunk push->event p50 {pctl(trimmed, 50):7.1f} ms   "
          f"p95 {pctl(trimmed, 95):7.1f} ms   (n={len(trimmed)})")
    print(json.dumps({
        "metric": "http_session_chunk_latency",
        "n_sessions": n_sessions, "with_batch": with_batch,
        "p50_ms": round(pctl(trimmed, 50), 1),
        "p95_ms": round(pctl(trimmed, 95), 1),
        "n": len(trimmed)}), flush=True)


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    model = argv[0] if len(argv) > 0 else "medium"
    n_chunks = int(argv[1]) if len(argv) > 1 else 6
    max_tokens = int(argv[2]) if len(argv) > 2 else 24
    reuse = "--reuse" in sys.argv
    partials = "--no-partials" not in sys.argv
    http = "--http" in sys.argv
    with_batch = "--with-batch" in sys.argv

    from whisper_apr_tpu import WhisperApr, TranscribeOptions
    from whisper_apr_tpu.audio.streaming import StreamingConfig
    from whisper_apr_tpu.config import ComputeConfig, ModelConfig
    from whisper_apr_tpu.inference.streaming import StreamingSession
    from whisper_apr_tpu.model.params import init_params, quantize_params

    cfg = ModelConfig.from_name(model)
    params = quantize_params(init_params(cfg, seed=0), "int8")
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    eng = WhisperApr(cfg, params, compute=ComputeConfig(
        compute_dtype="bfloat16", param_dtype="bfloat16",
        quantization="int8"))

    if http:
        run_http(eng, n_chunks, n_sessions=2, with_batch=with_batch)
        return

    scfg = StreamingConfig(
        input_sample_rate=SR, chunk_duration=CHUNK_S,
        chunk_overlap=OVERLAP_S, enable_vad=False,
        buffer_duration=max(2 * CHUNK_S, 10.0))
    opts = TranscribeOptions(language="en", max_tokens=max_tokens)

    def make_session():
        return StreamingSession(eng, options=opts, input_sample_rate=SR,
                                config=scfg, partial_reuse=reuse)

    rng = np.random.default_rng(0)
    push_n = int(PUSH_S * SR)

    # ---- warm-up: compile the fused chunk program (+ partial shapes) ----
    t0 = time.time()
    warm = make_session()
    emitted = 0
    while emitted < 1:
        res = warm.push(rng.normal(0, 0.1, push_n).astype(np.float32))
        emitted += sum(1 for r in res if r.kind == "chunk")
        if partials:
            warm.get_partial()
    print(f"warm-up (compiles) {time.time() - t0:.1f}s", flush=True)

    # ---- measured run ----
    sess = make_session()
    chunk_ms, partial_ms = [], []
    emitted = 0
    pushes = 0
    t_run = time.time()
    while emitted < n_chunks and pushes < n_chunks * 40:
        blk = rng.normal(0, 0.1, push_n).astype(np.float32)
        t0 = time.perf_counter()
        res = sess.push(blk)
        dt = (time.perf_counter() - t0) * 1e3
        pushes += 1
        got = sum(1 for r in res if r.kind == "chunk")
        if got:
            chunk_ms.append(dt)
            emitted += got
        if partials and sess.has_partial():
            t0 = time.perf_counter()
            sess.get_partial()
            partial_ms.append((time.perf_counter() - t0) * 1e3)
    wall = time.time() - t_run

    fed_s = pushes * PUSH_S
    print(f"\n{model} int8 streaming: {CHUNK_S:.0f}s chunks / "
          f"{OVERLAP_S * 1e3:.0f}ms overlap, max_tokens={max_tokens}, "
          f"partial_reuse={reuse}")
    print(f"fed {fed_s:.1f}s audio in {pushes} pushes; "
          f"{emitted} chunks, {len(partial_ms)} partial decodes; "
          f"wall {wall:.1f}s (pipeline RTF {wall / max(fed_s, 1e-9):.4f})")
    print(f"chunk->final   p50 {pctl(chunk_ms, 50):7.1f} ms   "
          f"p95 {pctl(chunk_ms, 95):7.1f} ms   (n={len(chunk_ms)})")
    if partial_ms:
        print(f"chunk->partial p50 {pctl(partial_ms, 50):7.1f} ms   "
              f"p95 {pctl(partial_ms, 95):7.1f} ms   (n={len(partial_ms)})")
    # one machine-readable line for BENCH_NOTES / lineup carriage
    import json
    print(json.dumps({
        "metric": "streaming_chunk_latency",
        "model": model, "chunk_s": CHUNK_S, "overlap_s": OVERLAP_S,
        "max_tokens": max_tokens, "partial_reuse": reuse,
        "chunk_final_p50_ms": round(pctl(chunk_ms, 50), 1),
        "chunk_final_p95_ms": round(pctl(chunk_ms, 95), 1),
        "partial_p50_ms": round(pctl(partial_ms, 50), 1) if partial_ms else None,
        "partial_p95_ms": round(pctl(partial_ms, 95), 1) if partial_ms else None,
        "n_chunks": emitted}), flush=True)


if __name__ == "__main__":
    main()
