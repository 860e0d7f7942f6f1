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

    def test_async_jobs_cancel_and_metrics(self, engine):
        """Async submit -> poll /v1/jobs; POST /v1/cancel aborts (Worker
        Abort parity, reference src/wasm/worker.rs:38); GET /metrics
        emits Prometheus text from scheduler.stats()."""
        from whisper_apr_tpu.cli.serve import TranscribeServer

        port = 18732
        server = TranscribeServer(engine, port=port, n_slots=1)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{port}"
        try:
            for _ in range(100):
                try:
                    urllib.request.urlopen(f"{base}/healthz", timeout=2)
                    break
                except OSError:
                    time.sleep(0.1)
            else:
                pytest.fail("server did not come up")

            rng = np.random.default_rng(2)
            audio = rng.normal(0, 0.1, 3200).astype("<f4")

            def submit_async(max_tokens):
                req = urllib.request.Request(
                    f"{base}/v1/transcribe?language=en"
                    f"&max_tokens={max_tokens}&async=1",
                    data=audio.tobytes(),
                    headers={"X-Sample-Format": "f32le"})
                with urllib.request.urlopen(req, timeout=30) as r:
                    assert r.status == 202
                    return json.loads(r.read())["id"]

            # async job completes and is pollable
            rid = submit_async(4)
            deadline = time.time() + 120
            out = {"status": "pending"}
            while out.get("status") == "pending" and time.time() < deadline:
                with urllib.request.urlopen(f"{base}/v1/jobs/{rid}",
                                            timeout=10) as r:
                    out = json.loads(r.read())
                time.sleep(0.05)
            assert out["status"] == "ok" and "tokens" in out

            # a queued job behind a long one can be cancelled
            r_long = submit_async(24)
            r_cancel = submit_async(24)
            creq = urllib.request.Request(
                f"{base}/v1/cancel?id={r_cancel}", data=b"")
            with urllib.request.urlopen(creq, timeout=10) as r:
                assert json.loads(r.read())["cancelled"] is True
            deadline = time.time() + 120
            out = {"status": "pending"}
            while out.get("status") == "pending" and time.time() < deadline:
                with urllib.request.urlopen(f"{base}/v1/jobs/{r_cancel}",
                                            timeout=10) as r:
                    out = json.loads(r.read())
                time.sleep(0.05)
            assert out["status"] == "cancelled"

            # unknown job id -> 404
            try:
                urllib.request.urlopen(f"{base}/v1/jobs/99999", timeout=10)
                pytest.fail("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404

            with urllib.request.urlopen(f"{base}/metrics", timeout=10) as r:
                text = r.read().decode()
            assert "whisper_apr_completed_ok" in text
            assert "# TYPE whisper_apr_queue_depth gauge" in text
            assert "whisper_apr_cancelled 1" in text
        finally:
            server.shutdown()
            t.join(timeout=10)

    def test_openai_compatible_endpoint(self, engine):
        """POST /v1/audio/transcriptions (multipart form-data) answers in
        json / text / verbose_json — drop-in for Whisper API clients."""
        import io
        import wave

        from whisper_apr_tpu.cli.serve import TranscribeServer

        port = 18734
        server = TranscribeServer(engine, port=port, n_slots=1)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{port}"
        try:
            for _ in range(100):
                try:
                    urllib.request.urlopen(f"{base}/healthz", timeout=2)
                    break
                except OSError:
                    time.sleep(0.1)
            else:
                pytest.fail("server did not come up")

            rng = np.random.default_rng(4)
            pcm = (rng.normal(0, 0.05, 3200) * 32767).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(16000)
                f.writeframes(pcm.tobytes())
            wav = buf.getvalue()

            def post(fields, path="/v1/audio/transcriptions"):
                boundary = "x-test-boundary"
                parts = []
                for name, (fname, payload) in fields.items():
                    head = f'Content-Disposition: form-data; name="{name}"'
                    if fname:
                        head += f'; filename="{fname}"'
                    parts.append(
                        f"--{boundary}\r\n{head}\r\n\r\n".encode()
                        + payload + b"\r\n")
                body = b"".join(parts) + f"--{boundary}--\r\n".encode()
                req = urllib.request.Request(
                    f"{base}{path}", data=body,
                    headers={"Content-Type":
                             f"multipart/form-data; boundary={boundary}"})
                return urllib.request.urlopen(req, timeout=120)

            with post({"file": ("a.wav", wav),
                       "language": (None, b"en")}) as r:
                out = json.loads(r.read())
            assert set(out) == {"text"}

            with post({"file": ("a.wav", wav),
                       "response_format": (None, b"text")}) as r:
                assert r.headers["Content-Type"].startswith("text/plain")
                body = r.read().decode()
            assert body.endswith("\n")

            with post({"file": ("a.wav", wav),
                       "response_format": (None, b"verbose_json")}) as r:
                out = json.loads(r.read())
            assert out["task"] == "transcribe"
            assert abs(out["duration"] - 0.2) < 1e-6

            # /v1/audio/translations runs the translate task
            with post({"file": ("a.wav", wav),
                       "response_format": (None, b"verbose_json")},
                      path="/v1/audio/translations") as r:
                out = json.loads(r.read())
            assert out["task"] == "translate"

            # missing file field -> 400
            try:
                post({"language": (None, b"en")})
                pytest.fail("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            server.shutdown()
            t.join(timeout=10)

    def test_streaming_session_over_http(self, engine):
        """POST /v1/sessions -> push f32le audio chunks -> poll events ->
        finalize (HTTP analog of the reference's WASM streaming-session
        wrappers, src/wasm/mod.rs:1090-1560)."""
        from whisper_apr_tpu.cli.serve import TranscribeServer

        port = 18733
        server = TranscribeServer(engine, port=port, n_slots=1)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{port}"
        try:
            for _ in range(100):
                try:
                    urllib.request.urlopen(f"{base}/healthz", timeout=2)
                    break
                except OSError:
                    time.sleep(0.1)
            else:
                pytest.fail("server did not come up")

            req = urllib.request.Request(
                f"{base}/v1/sessions?language=en&rate=16000&latency=low",
                data=b"")
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.status == 201
                sid = json.loads(r.read())["session"]

            # 1.5 s of speech-like audio in 250 ms chunks (low-latency
            # preset chunks every 500 ms)
            n = 4000
            tgrid = np.arange(6 * n) / 16_000.0
            rng = np.random.default_rng(0)
            audio = (0.5 * np.sin(2 * np.pi * 220.0 * tgrid)
                     + 0.1 * rng.normal(size=6 * n)).astype("<f4")
            for i in range(6):
                chunk = audio[i * n: (i + 1) * n]
                areq = urllib.request.Request(
                    f"{base}/v1/sessions/{sid}/audio",
                    data=chunk.tobytes())
                with urllib.request.urlopen(areq, timeout=30) as r:
                    assert json.loads(r.read())["queued_samples"] == n

            freq = urllib.request.Request(
                f"{base}/v1/sessions/{sid}/finalize", data=b"")
            with urllib.request.urlopen(freq, timeout=30) as r:
                assert r.status == 202

            deadline = time.time() + 120
            final = None
            nxt = 0
            kinds = []
            while final is None and time.time() < deadline:
                with urllib.request.urlopen(
                        f"{base}/v1/sessions/{sid}/events?since={nxt}",
                        timeout=10) as r:
                    out = json.loads(r.read())
                kinds += [e["kind"] for e in out["events"]]
                nxt = out["next"]
                final = out["final"]
                time.sleep(0.05)
            assert final is not None
            assert "final" in kinds and "error" not in kinds

            dreq = urllib.request.Request(
                f"{base}/v1/sessions/{sid}", method="DELETE")
            with urllib.request.urlopen(dreq, timeout=10) as r:
                assert json.loads(r.read())["deleted"] is True
            # the session is gone now
            try:
                urllib.request.urlopen(
                    f"{base}/v1/sessions/{sid}/events", timeout=10)
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


class TestEngineDarkPaths:
    """Round-3 coverage push: fallback batching, n-best, VAD transcribe,
    prompt/special validation."""

    @pytest.fixture(scope="class")
    def eng(self):
        from helpers import make_hf_twin, small_config, small_specials
        from whisper_apr_tpu import WhisperApr
        cfg = small_config()
        return WhisperApr.from_hf_model(make_hf_twin(cfg, seed=4), cfg,
                                        specials=small_specials(cfg))

    def test_batch_with_fallback_retries_and_skips(self, eng):
        from whisper_apr_tpu import TranscribeOptions
        rng = np.random.default_rng(0)
        audios = [rng.normal(0, 0.1, 3200).astype(np.float32)
                  for _ in range(2)]
        # impossible logprob threshold -> every temperature retries, the
        # pending loop runs to exhaustion, silence skip evaluated at end
        opts = TranscribeOptions(language="en", max_tokens=6,
                                 logprob_thold=100.0)
        out = eng.transcribe_batch_with_fallback(
            audios, opts, temperatures=(0.0, 0.5))
        assert len(out.results) == 2
        for r in out.results:
            assert isinstance(r.text, str)

    def test_transcribe_nbest(self, eng):
        from whisper_apr_tpu import TranscribeOptions
        rng = np.random.default_rng(1)
        audio = rng.normal(0, 0.1, 3200).astype(np.float32)
        opts = TranscribeOptions(language="en", strategy="beam",
                                 beam_size=3, max_tokens=8)
        out = eng.transcribe_nbest(audio, n=2, options=opts)
        assert 1 <= len(out) <= 2
        # ranked by normalized score
        assert all(isinstance(r.text, str) for r in out)
        assert out[0].avg_logprob >= out[-1].avg_logprob - 1e-6

    def test_transcribe_with_vad_speech_and_silence(self, eng):
        from whisper_apr_tpu import TranscribeOptions
        t = np.arange(16_000) / 16_000
        rng = np.random.default_rng(2)
        speech = (0.5 * np.sin(2 * np.pi * 220 * t)
                  + 0.1 * rng.normal(size=16_000)).astype(np.float32)
        opts = TranscribeOptions(language="en", max_tokens=6)
        r = eng.transcribe_with_vad(speech, opts)
        assert isinstance(r.text, str)
        silence = (1e-5 * rng.normal(size=8000)).astype(np.float32)
        r2 = eng.transcribe_with_vad(silence, opts)
        assert r2.text == "" and r2.segments == []

    def test_prompt_token_out_of_range(self):
        """get_initial_tokens rejects prompt ids beyond the vocabulary
        (XLA gathers clamp silently, so the host must validate)."""
        from helpers import make_hf_twin, small_config
        from whisper_apr_tpu import WhisperApr
        from whisper_apr_tpu.errors import ModelError
        from whisper_apr_tpu.tokenizer import SpecialTokens
        cfg = small_config()
        sp = SpecialTokens(eot=cfg.n_vocab - 1, sot=cfg.n_vocab - 2,
                           lang_base=10, transcribe=cfg.n_vocab + 7,
                           no_timestamps=12, timestamp_base=10_000,
                           is_multilingual=False, translate=13)
        eng2 = WhisperApr.from_hf_model(make_hf_twin(cfg, seed=0), cfg,
                                        specials=sp)
        with pytest.raises(ModelError):
            eng2.get_initial_tokens("en")

    def test_specials_out_of_range_raises(self):
        from helpers import make_hf_twin, small_config
        from whisper_apr_tpu import WhisperApr
        from whisper_apr_tpu.errors import ModelError
        from whisper_apr_tpu.tokenizer import SpecialTokens
        cfg = small_config()
        bad = SpecialTokens(eot=99_999, sot=99_998, lang_base=10,
                            transcribe=11, no_timestamps=12,
                            timestamp_base=10_000, is_multilingual=False,
                            translate=13)
        with pytest.raises(ModelError):
            WhisperApr.from_hf_model(make_hf_twin(cfg, seed=0), cfg,
                                     specials=bad)


class TestConfigPresets:
    def test_all_named_presets(self):
        from whisper_apr_tpu.config import ModelConfig
        for name in ("tiny", "base", "small", "medium", "large-v3",
                     "large-v3-turbo"):
            cfg = ModelConfig.from_name(name)
            assert cfg.n_audio_state % cfg.n_audio_head == 0
            assert cfg.audio_head_dim * cfg.n_audio_head \
                == cfg.n_audio_state
            assert cfg.text_head_dim > 0
            assert isinstance(cfg.model_type_code, int)
        from whisper_apr_tpu.errors import ConfigError
        with pytest.raises((ConfigError, KeyError, ValueError)):
            ModelConfig.from_name("nonexistent-model")

    def test_divisibility_validation(self):
        from whisper_apr_tpu.config import ModelConfig
        from whisper_apr_tpu.errors import ConfigError
        with pytest.raises(ConfigError):
            ModelConfig(model_type="tiny", n_vocab=100, n_audio_ctx=8,
                        n_audio_state=65, n_audio_head=4, n_audio_layer=1,
                        n_text_ctx=8, n_text_state=64, n_text_head=4,
                        n_text_layer=1, n_mels=80)


class TestTuiRunLoop:
    def test_run_tui_with_stub_curses(self, tmp_path, monkeypatch):
        """Drive run_tui end-to-end with a stubbed curses screen."""
        import wave
        from helpers import make_hf_twin, small_config, small_specials
        import whisper_apr_tpu.cli.tui as tui_mod

        # build a tiny apr + wav like the CLI E2E fixture but smaller
        from whisper_apr_tpu.audio.mel import mel_filterbank
        from whisper_apr_tpu.format import AprWriter, MelFilterbankData
        from whisper_apr_tpu.tokenizer import Vocabulary
        from whisper_apr_tpu.tools.convert import hf_state_dict_to_apr_tensors
        # full vocab so the default SpecialTokens table fits the model
        cfg = small_config(n_vocab=51_865)
        hf = make_hf_twin(cfg, seed=0)
        sd = {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}
        w = AprWriter.from_config(cfg)
        for name, arr in hf_state_dict_to_apr_tensors(sd).items():
            w.add_tensor(name, arr)
        vocab = Vocabulary.with_base_tokens()
        while len(vocab) < cfg.n_vocab:
            vocab.add_token(b"<|t%d|>" % len(vocab))
        w.set_vocabulary(vocab.to_bytes())
        w.set_mel_filterbank(MelFilterbankData(80, 201, mel_filterbank(80)))
        model = str(tmp_path / "m.apr")
        w.write_file(model)
        clip = str(tmp_path / "c.wav")
        pcm = (np.clip(np.random.default_rng(0).normal(0, 0.1, 4000), -1, 1)
               * 32767).astype(np.int16)
        with wave.open(clip, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(pcm.tobytes())

        class StubScreen:
            def __init__(self):
                self.frames = 0

            def nodelay(self, *_):
                pass

            def erase(self):
                pass

            def getmaxyx(self):
                return (40, 100)

            def addnstr(self, *_):
                self.frames += 1

            def refresh(self):
                pass

            def getch(self):
                return ord("q")

        stub = StubScreen()

        class StubCurses:
            error = Exception

            @staticmethod
            def wrapper(fn):
                return fn(stub)

            @staticmethod
            def curs_set(*_):
                pass

        monkeypatch.setitem(__import__("sys").modules, "curses", StubCurses)

        import argparse
        args = argparse.Namespace(model=model, audio=clip, language="en",
                                  max_tokens=4, verbose=False, quiet=True)
        rc = tui_mod.run_tui(args)
        assert rc == 0
        assert stub.frames > 0


class TestTranscribeServerSingleThread:
    def test_single_thread_mode_and_bad_body(self, engine):
        """single_thread=True pumps the device loop inside the handler
        (the required mode on remotely-tunneled devices); malformed
        bodies answer 400."""
        from whisper_apr_tpu.cli.serve import TranscribeServer
        port = 18741
        server = TranscribeServer(engine, port=port, n_slots=1,
                                  single_thread=True)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            for _ in range(100):
                try:
                    with urllib.request.urlopen(
                            f"http://127.0.0.1:{port}/healthz",
                            timeout=2) as r:
                        assert json.loads(r.read())["status"] == "ok"
                    break
                except OSError:
                    time.sleep(0.1)
            else:
                pytest.fail("server did not come up")
            rng = np.random.default_rng(1)
            audio = rng.normal(0, 0.1, 3200).astype("<f4")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/transcribe?language=en"
                f"&max_tokens=4",
                data=audio.tobytes(),
                headers={"X-Sample-Format": "f32le"})
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.loads(r.read())
            assert "text" in out
            # malformed WAV body -> 400
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/transcribe",
                data=b"not-a-wav")
            try:
                urllib.request.urlopen(bad, timeout=30)
                pytest.fail("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            server.shutdown()
            t.join(timeout=10)

    def test_run_serve_entry(self, engine, monkeypatch, tmp_path):
        """run_serve wires args -> server; KeyboardInterrupt shuts down."""
        import argparse
        from whisper_apr_tpu.cli import serve as serve_mod

        called = {}

        def fake_load(args):
            return engine

        def fake_forever(self):
            called["up"] = True
            raise KeyboardInterrupt

        monkeypatch.setattr("whisper_apr_tpu.cli.commands._load_engine",
                            fake_load)
        monkeypatch.setattr(serve_mod.TranscribeServer, "serve_forever",
                            fake_forever)
        args = argparse.Namespace(model="x.apr", host="127.0.0.1",
                                  port=18790, slots=1, single_thread=False,
                                  verbose=False, quiet=True)
        assert serve_mod.run_serve(args) == 0
        assert called["up"]
