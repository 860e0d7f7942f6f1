"""Tests for the modules the round-2 coverage run showed dark
(tools/coverage.py: cli/serve 0%, utils/benchmark 0%, utils/trace 0%,
cli/record 28%): HTTP serving end-to-end, benchmark report emitters,
trace spans, stdin chunking."""

import io
import json
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

from helpers import make_hf_twin, small_config, small_specials
from whisper_apr_tpu import WhisperApr


@pytest.fixture(scope="module")
def engine():
    cfg = small_config()
    hf = make_hf_twin(cfg)
    return WhisperApr.from_hf_model(hf, cfg, specials=small_specials(cfg))


class TestTranscribeServer:
    def test_http_roundtrip(self, engine):
        """POST f32le audio -> JSON text/tokens; GET /healthz. (The
        reference only stubs `serve`, commands.rs:970.)"""
        from whisper_apr_tpu.cli.serve import TranscribeServer

        port = 18731
        server = TranscribeServer(engine, port=port, n_slots=2)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            for _ in range(100):
                try:
                    with urllib.request.urlopen(
                            f"http://127.0.0.1:{port}/healthz",
                            timeout=2) as r:
                        health = json.loads(r.read())
                    break
                except OSError:
                    time.sleep(0.1)
            else:
                pytest.fail("server did not come up")
            assert health["status"] == "ok"

            rng = np.random.default_rng(0)
            audio = rng.normal(0, 0.1, 3200).astype("<f4")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/transcribe"
                f"?language=en&max_tokens=6",
                data=audio.tobytes(),
                headers={"X-Sample-Format": "f32le"})
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.loads(r.read())
            assert "text" in out and "tokens" in out
            assert out["decode_ms"] >= 0.0

            # unknown path -> 404
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/nope", data=b"x")
            try:
                urllib.request.urlopen(bad, timeout=10)
                pytest.fail("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()
            t.join(timeout=10)


class TestBenchmarkReport:
    def test_emitters_and_breakdown(self):
        from whisper_apr_tpu.utils.benchmark import (BenchmarkReport,
                                                     ComponentTiming)
        rep = BenchmarkReport(
            audio_seconds=30.0, total_seconds=0.3, tokens_decoded=224,
            components=[ComponentTiming("mel", 0.01, 0.0333),
                        ComponentTiming("encode", 0.09, 0.3),
                        ComponentTiming("decode", 0.2, 0.6667)])
        assert abs(rep.rtf - 0.01) < 1e-9
        assert rep.bottleneck() == "decode"
        j = json.loads(rep.to_json())
        assert j["rtf"] == rep.rtf
        csv = rep.to_csv()
        assert "mel" in csv and "decode" in csv
        txt = rep.to_text()
        assert "RTF" in txt or "rtf" in txt

    def test_run_pipeline_benchmark_random_weights(self):
        """Short run on the CPU backend with random tiny weights
        (reference: benchmark.rs RtfBenchmarkConfig::whisper_tiny)."""
        from whisper_apr_tpu.utils.benchmark import run_pipeline_benchmark
        out = run_pipeline_benchmark(audio_seconds=1.0, decode_tokens=3,
                                     emit="json")
        rep = json.loads(out)
        assert rep["tokens_per_second"] > 0
        assert set(c["name"] for c in rep["components"]) >= {
            "mel", "encode", "decode"}


class TestTrace:
    def test_spans_and_events(self):
        from whisper_apr_tpu.utils import trace
        trace.enable_tracing(True)
        try:
            with trace.trace_span("outer"):
                trace.trace_event("marker")
                with trace.trace_span("inner"):
                    pass
            events = trace.drain_events()
        finally:
            trace.enable_tracing(False)
        names = [e[0] for e in events]
        assert "outer" in names and "inner" in names and "marker" in names
        # spans drained: second drain is empty
        assert trace.drain_events() == []

    def test_disabled_is_free(self):
        from whisper_apr_tpu.utils import trace
        trace.enable_tracing(False)
        with trace.trace_span("nope"):
            trace.trace_event("nope")
        assert trace.drain_events() == []


class TestRecordChunking:
    def _with_stdin(self, payload: bytes):
        class FakeStdin:
            buffer = io.BytesIO(payload)
        return FakeStdin()

    def test_f32le_chunks(self, monkeypatch):
        from whisper_apr_tpu.cli.record import _read_stdin_chunks
        samples = np.arange(16_000, dtype="<f4") / 16_000
        monkeypatch.setattr(sys, "stdin", self._with_stdin(samples.tobytes()))
        chunks = list(_read_stdin_chunks("f32le", 0.25, None))
        assert sum(len(c) for c in chunks) == 16_000
        np.testing.assert_allclose(np.concatenate(chunks), samples, rtol=0,
                                   atol=0)

    def test_s16le_scaling_and_max_seconds(self, monkeypatch):
        from whisper_apr_tpu.cli.record import _read_stdin_chunks
        pcm = np.full(16_000, 16_384, dtype="<i2")  # 0.5 full-scale
        monkeypatch.setattr(sys, "stdin", self._with_stdin(pcm.tobytes()))
        chunks = list(_read_stdin_chunks("s16le", 0.25, max_seconds=0.5))
        total = np.concatenate(chunks)
        assert len(total) == 8000  # stops at max_seconds
        np.testing.assert_allclose(total, 0.5, atol=1e-4)


class TestWavVariants:
    """PCM 8/24/32-bit + float32 + stereo parse paths
    (reference: src/audio/wav.rs:99 parse, format table)."""

    def _wav(self, fmt_tag, bits, channels, frames: bytes, rate=16000):
        import struct
        block = channels * (bits // 8)
        fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate,
                          rate * block, block, bits)
        data = frames
        riff = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(riff)) + riff

    def test_pcm8(self):
        from whisper_apr_tpu.audio.wav import parse_wav
        frames = bytes([128, 255, 0, 128])  # 0, +1, -1, 0 (unsigned 8-bit)
        s, rate = parse_wav(self._wav(1, 8, 1, frames))
        assert rate == 16000
        np.testing.assert_allclose(s, [0.0, 127 / 128, -1.0, 0.0], atol=1e-2)

    def test_pcm24(self):
        from whisper_apr_tpu.audio.wav import parse_wav
        def i24(v):
            return int(v).to_bytes(3, "little", signed=True)
        frames = i24(0) + i24(2**23 - 1) + i24(-(2**23))
        s, _ = parse_wav(self._wav(1, 24, 1, frames))
        np.testing.assert_allclose(s, [0.0, 1.0, -1.0], atol=1e-6)

    def test_pcm32_and_stereo_downmix(self):
        import struct
        from whisper_apr_tpu.audio.wav import parse_wav
        # stereo 32-bit: L=+max R=-max -> downmix 0
        frames = struct.pack("<ii", 2**31 - 1, -(2**31))
        s, _ = parse_wav(self._wav(1, 32, 2, frames))
        assert len(s) == 1
        assert abs(float(s[0])) < 1e-6

    def test_float32(self):
        import struct
        from whisper_apr_tpu.audio.wav import parse_wav
        frames = struct.pack("<3f", 0.5, -0.25, 1.0)
        s, _ = parse_wav(self._wav(3, 32, 1, frames))
        np.testing.assert_allclose(s, [0.5, -0.25, 1.0], rtol=1e-6)

    def test_bad_magic_raises(self):
        from whisper_apr_tpu.audio.wav import parse_wav
        from whisper_apr_tpu.errors import AudioError
        with pytest.raises(AudioError):
            parse_wav(b"JUNK" + b"\x00" * 64)


class TestCrc32Incremental:
    def test_streaming_matches_oneshot(self):
        import zlib
        from whisper_apr_tpu.format.checksum import Crc32, crc32
        c = Crc32()
        parts = [b"hello ", b"", b"world", b"!" * 100]
        for p in parts:
            c.update(p)
        whole = b"".join(parts)
        assert c.finalize() == crc32(whole) == zlib.crc32(whole) & 0xFFFFFFFF
