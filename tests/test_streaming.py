"""Streaming subsystem tests: ring buffer, VAD, processor state machine.

(mirror reference inline tests in src/audio/ring_buffer.rs, src/vad.rs,
src/audio/streaming.rs)
"""

import numpy as np
import pytest

from whisper_apr_tpu.audio.ring_buffer import RingBuffer
from whisper_apr_tpu.audio.streaming import (
    LatencyMode,
    ProcessorState,
    StreamingConfig,
    StreamingProcessor,
)
from whisper_apr_tpu.errors import AudioError
from whisper_apr_tpu.vad import (
    SilenceDetector,
    StreamingVad,
    VadConfig,
    VoiceActivityDetector,
    frame_energy,
    zero_crossing_rate,
)


def speech_like(n, seed=0, freq=220.0):
    """Loud harmonic signal (VAD-positive)."""
    t = np.arange(n) / 16_000
    rng = np.random.default_rng(seed)
    return (0.5 * np.sin(2 * np.pi * freq * t)
            + 0.1 * rng.normal(size=n)).astype(np.float32)


def silence_like(n, seed=0):
    rng = np.random.default_rng(seed)
    return (1e-4 * rng.normal(size=n)).astype(np.float32)


class TestRingBuffer:
    def test_write_read_roundtrip(self):
        rb = RingBuffer(100)
        data = np.arange(50, dtype=np.float32)
        assert rb.write(data) == 50
        assert np.array_equal(rb.read(50), data)
        assert rb.is_empty()

    def test_wraparound(self):
        rb = RingBuffer(10)
        rb.write(np.arange(8, dtype=np.float32))
        rb.read(6)
        rb.write(np.arange(8, dtype=np.float32) + 100)
        out = rb.read(10)
        assert np.array_equal(out, np.array([6, 7] + list(range(100, 108)),
                                            dtype=np.float32))

    def test_write_overwrite_drops_oldest(self):
        rb = RingBuffer(10)
        rb.write(np.arange(10, dtype=np.float32))
        dropped = rb.write_overwrite(np.array([100, 101], dtype=np.float32))
        assert dropped == 2
        out = rb.read(10)
        assert out[0] == 2.0 and out[-1] == 101.0

    def test_overwrite_larger_than_capacity(self):
        rb = RingBuffer(4)
        rb.write_overwrite(np.arange(10, dtype=np.float32))
        assert np.array_equal(rb.read(4), np.array([6, 7, 8, 9], np.float32))

    def test_peek_does_not_consume(self):
        rb = RingBuffer(10)
        rb.write(np.arange(5, dtype=np.float32))
        assert np.array_equal(rb.peek(3), np.array([0, 1, 2], np.float32))
        assert len(rb) == 5

    def test_skip(self):
        rb = RingBuffer(10)
        rb.write(np.arange(5, dtype=np.float32))
        assert rb.skip(2) == 2
        assert rb.read(1)[0] == 2.0

    def test_for_duration(self):
        rb = RingBuffer.for_duration(2.0, 16_000)
        assert rb.capacity == 32_000

    def test_zero_capacity(self):
        with pytest.raises(AudioError):
            RingBuffer(0)


class TestVad:
    def test_energy_and_zcr(self):
        assert frame_energy(np.zeros(480)) == 0.0
        assert frame_energy(np.ones(480)) == pytest.approx(1.0)
        alternating = np.array([1, -1] * 240, dtype=np.float32)
        assert zero_crossing_rate(alternating) > 0.9

    def test_detects_speech_after_silence(self):
        vad = VoiceActivityDetector()
        for _ in range(20):  # establish noise floor
            vad.process_frame(silence_like(480))
        assert not vad.in_speech
        for _ in range(5):
            vad.process_frame(speech_like(480))
        assert vad.in_speech

    def test_hangover_to_silence(self):
        vad = VoiceActivityDetector()
        for _ in range(20):
            vad.process_frame(silence_like(480))
        for _ in range(5):
            vad.process_frame(speech_like(480))
        assert vad.in_speech
        # needs min_silence_frames (10) to drop out
        for i in range(9):
            vad.process_frame(silence_like(480))
        assert vad.in_speech
        vad.process_frame(silence_like(480))
        assert not vad.in_speech

    def test_detect_segments(self):
        audio = np.concatenate([
            silence_like(16_000), speech_like(16_000), silence_like(16_000)])
        segs = VoiceActivityDetector().detect(audio)
        assert len(segs) == 1
        s, e = segs[0]
        assert abs(s - 16_000) < 4_800  # within 10 frames
        assert abs(e - 32_000) < 9_600

    def test_presets(self):
        assert VadConfig.low_latency().frame_size == 160
        assert VadConfig.high_accuracy().frame_size == 800

    def test_silence_detector(self):
        sd = SilenceDetector()
        seg = None
        for _ in range(40):  # 40 x 480 samples = 1.2 s silence
            sd.process_frame(silence_like(480))
        for _ in range(3):
            out = sd.process_frame(speech_like(480))
            seg = seg or out
        assert seg is not None
        assert seg.duration() >= 0.5

    def test_streaming_vad_filters(self):
        sv = StreamingVad()
        silence = silence_like(4800)
        for _ in range(3):
            sv.filter(silence)
        filtered = sv.filter(silence)
        assert np.allclose(filtered, 0.0)


class TestStreamingProcessor:
    def test_config_presets(self):
        # reference: streaming.rs:146,177
        low = StreamingConfig.low_latency()
        assert low.chunk_duration == 0.5 and low.chunk_overlap == 0.05
        ultra = StreamingConfig.ultra_low_latency()
        assert ultra.chunk_duration == 0.25 and ultra.min_speech_duration_ms == 50

    def test_speech_chunk_lifecycle(self):
        cfg = StreamingConfig(
            input_sample_rate=16_000, chunk_duration=1.0, chunk_overlap=0.1,
            min_speech_duration_ms=300)
        p = StreamingProcessor(cfg)
        assert p.state == ProcessorState.WAITING_FOR_SPEECH

        # silence first (noise floor), then speech, then silence
        p.push_audio(silence_like(16_000))
        p.process()
        p.push_audio(speech_like(16_000))
        events = p.process()
        kinds = [e.kind for e in events]
        assert "speech_started" in kinds

        p.push_audio(silence_like(16_000))
        events = p.process()
        kinds = [e.kind for e in events]
        assert "chunk_ready" in kinds or p.has_chunk()
        chunk = p.get_chunk()
        assert chunk is not None
        assert len(chunk) >= 4_800  # >= min_speech 300ms

    def test_partial_available_while_accumulating(self):
        cfg = StreamingConfig(input_sample_rate=16_000, chunk_duration=10.0)
        p = StreamingProcessor(cfg)
        p.push_audio(silence_like(16_000))
        p.process()
        p.push_audio(speech_like(8_000))
        p.process()
        assert p.has_partial()
        partial = p.get_partial()
        assert partial is not None and len(partial) > 0
        # get_partial is non-destructive
        assert p.has_partial()

    def test_flush(self):
        cfg = StreamingConfig(input_sample_rate=16_000, chunk_duration=30.0)
        p = StreamingProcessor(cfg)
        p.push_audio(silence_like(16_000))
        p.process()
        p.push_audio(speech_like(5_000))
        chunk = p.flush()
        assert chunk is not None and len(chunk) > 0

    def test_error_recovery(self):
        p = StreamingProcessor(StreamingConfig(input_sample_rate=16_000))
        p.mark_error("boom")
        assert p.state == ProcessorState.ERROR
        p.recover_from_error()
        assert p.state == ProcessorState.WAITING_FOR_SPEECH

    def test_resampling_path(self):
        # 44.1k input must come out as 16k chunks
        cfg = StreamingConfig(chunk_duration=0.5, chunk_overlap=0.05,
                              min_speech_duration_ms=100,
                              latency_mode=LatencyMode.LOW_LATENCY)
        p = StreamingProcessor(cfg)
        t = np.arange(44_100) / 44_100
        speech = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        p.push_audio((1e-4 * np.ones(44_100)).astype(np.float32))
        p.process()
        p.push_audio(speech)
        p.process()
        chunk = p.flush()
        assert chunk is not None
        # 1 s of speech at 16k ~ 16000 samples (chunked at 8000)
        assert 4_000 <= len(chunk) <= 20_000


@pytest.fixture(scope="module")
def engine():
    from helpers import make_hf_twin, small_config, small_specials
    from whisper_apr_tpu import WhisperApr
    cfg = small_config()
    return WhisperApr.from_hf_model(make_hf_twin(cfg), cfg,
                                    specials=small_specials(cfg))


class TestOverlapDedup:
    def test_token_dedup(self):
        from whisper_apr_tpu.inference.streaming import dedup_overlap_tokens
        prev = [1, 2, 3, 4, 5]
        assert dedup_overlap_tokens(prev, [4, 5, 6, 7]) == [6, 7]
        assert dedup_overlap_tokens(prev, [9, 9]) == [9, 9]
        assert dedup_overlap_tokens([], [1, 2]) == [1, 2]
        # longest match wins
        assert dedup_overlap_tokens([7, 8, 7, 8], [7, 8, 7, 8, 1],
                                    max_overlap=4) == [1]

    def test_word_dedup(self):
        from whisper_apr_tpu.inference.streaming import dedup_overlap_words
        assert dedup_overlap_words("the cat sat on", "on the mat") == "the mat"
        assert dedup_overlap_words("hello world.", "World is big") == "is big"
        assert dedup_overlap_words("abc", "def ghi") == "def ghi"
        assert dedup_overlap_words("", "x y") == "x y"

    def test_transcriber_dedups_chunks(self, engine):
        """Synthetic: force the engine to return overlapping text chunks and
        check the stitched transcript has no duplicated words."""
        from whisper_apr_tpu.inference.streaming import StreamingTranscriber
        st = StreamingTranscriber(engine)
        outs = ["the quick brown fox", "brown fox jumps over", "jumps over the dog"]
        calls = []

        class FakeResult:
            def __init__(self, text):
                self.text = text
                self.tokens = []

        def fake_transcribe(chunk, opts):
            calls.append(len(chunk))
            return FakeResult(outs[min(len(calls) - 1, len(outs) - 1)])

        st.engine = type("E", (), {"transcribe": staticmethod(fake_transcribe)})()
        for text in outs:
            st._transcript.append(st._dedup(text)) if st._dedup(text) else None
        assert st.transcript == "the quick brown fox jumps over the dog"

    def test_transcribe_long_dedups(self, engine):
        import dataclasses
        import numpy as np
        from whisper_apr_tpu.engine import (BatchTranscriptionResult,
                                            TranscriptionResult)
        overlapping = BatchTranscriptionResult([
            TranscriptionResult("the birds fly south", "en", [], [1, 2]),
            TranscriptionResult("fly south in winter", "en", [], [3, 4]),
        ], 0.0)
        engine2 = engine
        orig = engine2.transcribe_batch
        engine2.transcribe_batch = lambda *a, **k: overlapping
        try:
            window = 2 * engine2.config.n_audio_ctx * 160
            audio = np.zeros(window + 16_000, np.float32)
            r = engine2.transcribe_long(audio)
        finally:
            engine2.transcribe_batch = orig
        assert r.text == "the birds fly south in winter"


class TestPartialReady:
    def test_partial_ready_event_and_state(self):
        from whisper_apr_tpu.audio.streaming import (ProcessorState,
                                                     StreamingConfig,
                                                     StreamingProcessor)
        cfg = StreamingConfig.with_sample_rate(16_000)
        p = StreamingProcessor(cfg)
        p.set_partial_threshold(0.5)  # trip quickly
        rng = np.random.default_rng(0)
        t = np.arange(16_000) / 16_000.0
        speech = (0.5 * np.sin(2 * np.pi * 220 * t)
                  + 0.05 * rng.normal(size=len(t))).astype(np.float32)
        p.push_audio(speech)
        events = p.process()
        kinds = [e.kind for e in events]
        assert "partial_ready" in kinds
        assert p.state == ProcessorState.PARTIAL_RESULT_READY
        assert p.has_partial()
        # the partial event fires once per chunk
        p.push_audio(speech)
        kinds2 = [e.kind for e in p.process()]
        assert "partial_ready" not in kinds2

    def test_partial_resets_after_chunk(self):
        from whisper_apr_tpu.audio.streaming import (StreamingConfig,
                                                     StreamingProcessor)
        import dataclasses
        cfg = dataclasses.replace(
            StreamingConfig.custom_latency(
                chunk_duration=1.0, chunk_overlap=0.1,
                min_speech_duration_ms=100, buffer_duration=30.0),
            input_sample_rate=16_000)
        p = StreamingProcessor(cfg)
        p.set_partial_threshold(0.3)
        rng = np.random.default_rng(1)
        t = np.arange(32_000) / 16_000.0
        speech = (0.5 * np.sin(2 * np.pi * 220 * t)
                  + 0.05 * rng.normal(size=len(t))).astype(np.float32)
        p.push_audio(speech)
        events = p.process()
        kinds = [e.kind for e in events]
        assert kinds.count("partial_ready") >= 1
        assert "chunk_ready" in kinds


class TestPrefixReuse:
    """Token-level streaming reuse: partials decode only the new suffix
    (the sound TPU realization of StreamingKVCache::warm_up,
    reference: src/model/decoder.rs:739)."""

    @pytest.fixture(scope="class")
    def engine(self):
        from helpers import make_hf_twin, small_config, small_specials
        from whisper_apr_tpu import WhisperApr
        cfg = small_config()
        hf = make_hf_twin(cfg, seed=5)
        return WhisperApr.from_hf_model(hf, cfg,
                                        specials=small_specials(cfg))

    def test_prefixed_continuation_is_exact(self, engine):
        """Greedy continuation of the full decode's own prefix reproduces
        the full decode token-for-token (the equivalence gate)."""
        from whisper_apr_tpu import TranscribeOptions
        rng = np.random.default_rng(0)
        audio = rng.normal(0, 0.2, 16_000).astype(np.float32)
        opts = TranscribeOptions(language="en", max_tokens=24)
        full = engine.transcribe(audio, opts)
        initial = engine.get_initial_tokens("en")
        gen = [t for t in full.tokens[len(initial):]
               if t != engine.specials.eot]
        if len(gen) <= engine.PREFIX_BUCKET:
            pytest.skip("decode too short to exercise a bucketed prefix")
        pre = engine.transcribe_prefixed(audio, gen[:-2], opts)
        assert pre.tokens == full.tokens

    def test_prefix_bucket_truncation(self, engine):
        from whisper_apr_tpu import TranscribeOptions
        rng = np.random.default_rng(1)
        audio = rng.normal(0, 0.2, 16_000).astype(np.float32)
        opts = TranscribeOptions(language="en", max_tokens=20)
        full = engine.transcribe(audio, opts)
        initial = engine.get_initial_tokens("en")
        gen = [t for t in full.tokens[len(initial):]
               if t != engine.specials.eot]
        # an unbucketed length must not produce a new compile shape: the
        # call succeeds and still reproduces the full decode
        pre = engine.transcribe_prefixed(audio, gen[:11], opts)
        assert pre.tokens == full.tokens

    def test_prefix_too_long_falls_back(self, engine):
        from whisper_apr_tpu import TranscribeOptions
        rng = np.random.default_rng(2)
        audio = rng.normal(0, 0.2, 8_000).astype(np.float32)
        opts = TranscribeOptions(language="en", max_tokens=8)
        r = engine.transcribe_prefixed(audio, list(range(5, 5 + 32)), opts)
        assert isinstance(r.text, str)

    def test_session_partials_use_reuse(self, engine, monkeypatch):
        from whisper_apr_tpu.inference.streaming import StreamingSession
        sess = StreamingSession(engine, input_sample_rate=16_000,
                                partial_reuse=True)
        calls = {"prefixed": 0}
        orig = engine.transcribe_prefixed

        def spy(audio, prefix, options=None):
            calls["prefixed"] += 1
            return orig(audio, prefix, options)

        monkeypatch.setattr(engine, "transcribe_prefixed", spy)
        amp = speech_like(16_000)
        for _ in range(3):
            sess.push(amp)
            if sess.has_partial():
                p = sess.get_partial()
                assert p is None or isinstance(p, str)
        assert calls["prefixed"] >= 1
        final = sess.finalize()
        assert isinstance(final, str)


class TestRingBufferMutationGaps:
    """Tests added for surviving mutants (tools/mutate.py run, round 3)."""

    def test_is_full_boundary(self):
        rb = RingBuffer(8)
        rb.write_overwrite(np.arange(7, dtype=np.float32))
        assert not rb.is_full()
        rb.write_overwrite(np.arange(1, dtype=np.float32))
        assert rb.is_full()

    def test_overwrite_exact_capacity(self):
        """A write of exactly `capacity` samples takes the bulk-replace
        path (>= boundary) and reports the right drop count."""
        rb = RingBuffer(8)
        rb.write_overwrite(np.ones(3, np.float32))
        dropped = rb.write_overwrite(np.arange(8, dtype=np.float32))
        assert dropped == 3          # 3 live + 8 new - 8 capacity
        np.testing.assert_array_equal(rb.read(8),
                                      np.arange(8, dtype=np.float32))

    def test_overwrite_drop_count_partial(self):
        rb = RingBuffer(8)
        rb.write_overwrite(np.ones(6, np.float32))
        dropped = rb.write_overwrite(np.ones(4, np.float32))
        assert dropped == 2          # 6 + 4 - 8
        assert len(rb) == 8
