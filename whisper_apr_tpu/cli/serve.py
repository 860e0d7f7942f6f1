"""HTTP transcription server over the continuous-batching scheduler.

The reference stubs its ``serve`` command ("not yet implemented",
reference: src/cli/commands.rs:770-790); here it is implemented: a stdlib
ThreadingHTTPServer front end feeding the BatchScheduler. The device loop
runs on the MAIN thread (remote-TPU tunnels do not support dispatch from
secondary threads); HTTP handler threads only enqueue requests and poll
completions.

API:
  POST /v1/transcribe   body: WAV bytes (or raw f32 PCM with
                        X-Sample-Format: f32le + X-Sample-Rate header)
                        query: ?language=en&task=transcribe&max_tokens=224
                               &timeout_s=30 (deadline -> status "timeout")
                               &async=1 (return {"id": N} immediately)
                        -> {"text": ..., "tokens": [...], "queue_ms": ...,
                            "status": "ok"|"cancelled"|"timeout"}
  GET  /v1/jobs/<id>    poll an async job -> result, or {"status":"pending"}
  POST /v1/cancel?id=N  abort a queued/in-flight request (Worker-protocol
                        Abort parity, reference: src/wasm/worker.rs:38)
  GET  /metrics         Prometheus text: slots, queue depth, completions,
                        tokens/sec (scheduler.stats(); SURVEY §5.5)
  GET  /healthz         -> {"status": "ok", "pending": N}
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..audio import SAMPLE_RATE, parse_wav
from ..audio.resample import SincResampler
from ..parallel.serving import BatchScheduler


def _decode_body(handler: BaseHTTPRequestHandler, body: bytes) -> np.ndarray:
    fmt = handler.headers.get("X-Sample-Format", "wav")
    if fmt == "f32le":
        rate = int(handler.headers.get("X-Sample-Rate", SAMPLE_RATE))
        samples = np.frombuffer(body, dtype="<f4").astype(np.float32)
    else:
        samples, rate = parse_wav(body)
    if rate != SAMPLE_RATE:
        samples = SincResampler(rate, SAMPLE_RATE).resample(samples)
    return samples


class TranscribeServer:
    """HTTP front end + main-thread device loop."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 8000,
                 n_slots: int = 8, single_thread: bool = False,
                 batched_admission: bool = True) -> None:
        self.engine = engine
        self.scheduler = BatchScheduler(engine, n_slots=n_slots,
                                        batched_admission=batched_admission)
        self.host = host
        self.port = port
        self.single_thread = single_thread
        self._httpd = None
        self._stop = threading.Event()

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _json(self, code: int, payload: dict) -> None:
                data = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _completion_payload(self, comp) -> dict:
                text = (server.scheduler.decode_text(comp)
                        if comp.tokens else "")
                return {
                    "text": text,
                    "tokens": comp.tokens,
                    "queue_ms": round(comp.queue_seconds * 1e3, 1),
                    "decode_ms": round(comp.decode_seconds * 1e3, 1),
                    "status": comp.status,
                }

            def do_GET(self):
                if self.path.startswith("/healthz"):
                    self._json(200, {"status": "ok",
                                     "pending": server.scheduler.pending()})
                elif self.path.startswith("/metrics"):
                    stats = server.scheduler.stats()
                    lines = []
                    for key, val in sorted(stats.items()):
                        name = f"whisper_apr_{key}"
                        kind = ("gauge" if key in (
                            "queue_depth", "active_slots", "n_slots",
                            "tokens_per_decode_second") else "counter")
                        lines.append(f"# TYPE {name} {kind}")
                        lines.append(f"{name} {val}")
                    data = ("\n".join(lines) + "\n").encode("utf-8")
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/plain; version=0.0.4")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path.startswith("/v1/jobs/"):
                    try:
                        rid = int(self.path.rsplit("/", 1)[1])
                    except ValueError:
                        self._json(400, {"error": "bad job id"})
                        return
                    if server.single_thread:
                        server.scheduler.step()
                    comp = server.scheduler.result(rid)
                    if comp is not None:
                        self._json(200, self._completion_payload(comp))
                    elif rid < server.scheduler._next_id:
                        self._json(200, {"status": "pending"})
                    else:
                        self._json(404, {"error": "unknown job"})
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                parsed = urllib.parse.urlparse(self.path)
                q = urllib.parse.parse_qs(parsed.query)
                if parsed.path == "/v1/cancel":
                    try:
                        rid = int(q.get("id", [""])[0])
                    except ValueError:
                        self._json(400, {"error": "bad or missing id"})
                        return
                    ok = server.scheduler.cancel(rid)
                    self._json(200, {"id": rid, "cancelled": ok})
                    return
                if parsed.path != "/v1/transcribe":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(length)
                    audio = _decode_body(self, body)
                    lang = q.get("language", ["en"])[0]
                    task = q.get("task", ["transcribe"])[0]
                    max_tokens = int(q.get("max_tokens", ["224"])[0])
                    timeout_s = q.get("timeout_s", [None])[0]
                    timeout_s = float(timeout_s) if timeout_s else None
                    rid = server.scheduler.submit(
                        audio, lang, task, max_tokens, timeout_s=timeout_s)
                    if q.get("async", ["0"])[0] in ("1", "true"):
                        self._json(202, {"id": rid, "status": "pending"})
                        return
                    deadline = time.time() + 300
                    while time.time() < deadline:
                        if server.single_thread:
                            # single-threaded mode: pump the device loop
                            # inline (remote-TPU tunnels deadlock when device
                            # dispatch coexists with other Python threads)
                            server.scheduler.step()
                        comp = server.scheduler.result(rid)
                        if comp is not None:
                            self._json(200, self._completion_payload(comp))
                            return
                        time.sleep(0.005)
                    self._json(504, {"error": "decode timeout"})
                except Exception as e:  # noqa: BLE001 - HTTP boundary
                    self._json(400, {"error": str(e)})

        return Handler

    def serve_forever(self) -> None:
        """Threaded mode: HTTP handlers on worker threads, device loop on
        THIS thread. Single-thread mode: one serial HTTP server whose
        handlers pump the device loop inline (required on remotely-tunneled
        devices where device dispatch must be the only Python thread)."""
        if self.single_thread:
            from http.server import HTTPServer
            self._httpd = HTTPServer((self.host, self.port),
                                     self._make_handler())
            print(f"serving on http://{self.host}:{self.port} "
                  f"({self.scheduler.n_slots} slots, single-thread)")
            try:
                while not self._stop.is_set():
                    self._httpd.handle_request()
            finally:
                self._httpd.server_close()
            return
        self._httpd = ThreadingHTTPServer((self.host, self.port),
                                          self._make_handler())
        http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        http_thread.start()
        print(f"serving on http://{self.host}:{self.port} "
              f"({self.scheduler.n_slots} slots)")
        try:
            while not self._stop.is_set():
                if self.scheduler.step() == 0:
                    time.sleep(0.002)
        finally:
            self._httpd.shutdown()

    def shutdown(self) -> None:
        self._stop.set()


def run_serve(args) -> int:
    from .commands import _load_engine
    engine = _load_engine(args)
    server = TranscribeServer(
        engine, host=args.host, port=args.port, n_slots=args.slots,
        single_thread=args.single_thread,
        batched_admission=not getattr(args, "staged_admission", False))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0
