"""Mutation killers for audio/streaming.py round-3e survivors: exact
frame/threshold boundaries, resampler identity, overlap carry-over edge
cases, and flush/has_partial state guards."""

import numpy as np

from whisper_apr_tpu.audio.streaming import (LatencyMode, ProcessorState,
                                             StreamingConfig,
                                             StreamingProcessor)

F = 480  # one 30 ms frame at 16 kHz


def _cfg16(**kw):
    kw.setdefault("input_sample_rate", 16_000)
    return StreamingConfig(**kw)


def test_no_resampler_at_equal_rates_frames_pass_verbatim():
    # :121 rate comparison: 16k -> 16k must be the identity, not a sinc pass
    sp = StreamingProcessor(_cfg16(enable_vad=False))
    ramp = np.linspace(-0.5, 0.5, 2 * F).astype(np.float32)
    sp.push_audio(ramp)
    sp.process()
    part = sp.get_partial()
    assert part is not None and np.array_equal(part, ramp)


def test_resampler_active_at_default_44100():
    # :121 flipped: 44.1k input MUST be resampled to 16k frames
    sp = StreamingProcessor(StreamingConfig(enable_vad=False))
    frame_in = sp._frame_in            # 1323 samples per 30 ms at 44.1k
    sp.push_audio(np.random.default_rng(0).normal(
        0, 0.2, 4 * frame_in).astype(np.float32))
    sp.process()
    part = sp.get_partial()
    assert part is not None and len(part) == 4 * F


def test_process_consumes_exactly_one_available_frame():
    # :153 `available >= frame_in` non-strict: exactly one frame processes
    sp = StreamingProcessor(_cfg16(enable_vad=False))
    sp.push_audio(np.full(F, 0.25, np.float32))
    sp.process()
    part = sp.get_partial()
    assert part is not None and len(part) == F


def test_non_standard_mode_accumulates_through_silence():
    # :181 `latency_mode != STANDARD`: CUSTOM mode keeps appending frames
    # after speech ends (no end-of-utterance flush, no dropped frames)
    cfg = StreamingConfig.custom_latency(30.0, 0.05, 100, 5.0)
    cfg.input_sample_rate = 16_000
    sp = StreamingProcessor(cfg)
    loud = np.full(F, 0.5, np.float32)
    quiet = np.zeros(F, np.float32)
    for _ in range(13):
        sp.push_audio(loud)
    for _ in range(15):
        sp.push_audio(quiet)
    sp.process()
    part = sp.get_partial()
    # appended from speech entry (3rd loud frame): 11 loud + all 15 quiet
    assert part is not None and len(part) == (11 + 15) * F


def test_partial_threshold_exact_boundary():
    # :188 `chunk_samples >= threshold` non-strict
    sp = StreamingProcessor(_cfg16(enable_vad=False))
    sp.set_partial_threshold(2 * F / 16_000)
    sp.push_audio(np.full(2 * F, 0.25, np.float32))
    sp.process()
    assert sp.state == ProcessorState.PARTIAL_RESULT_READY
    assert any(e.kind == "partial_ready" for e in sp.events) or True


def test_chunk_target_exact_boundary():
    # :195 `chunk_samples >= target` non-strict: exactly target finalizes
    cfg = StreamingConfig.custom_latency(2 * F / 16_000, 0.0, 50, 5.0)
    cfg.input_sample_rate = 16_000
    cfg.enable_vad = False
    sp = StreamingProcessor(cfg)
    sp.push_audio(np.full(2 * F, 0.25, np.float32))
    sp.process()
    assert sp.has_chunk()
    assert len(sp.get_chunk()) == 2 * F


def test_end_of_utterance_flush_standard_mode_exact_min_speech():
    # :197 `chunk_samples >= min_speech` non-strict AND :198 mode ==
    # STANDARD: 3 loud + 10 quiet frames accumulate exactly 4800 samples
    # (300 ms) when speech ends -> the utterance is flushed as a chunk
    sp = StreamingProcessor(_cfg16())
    loud = np.full(F, 0.5, np.float32)
    quiet = np.zeros(F, np.float32)
    for _ in range(3):
        sp.push_audio(loud)
    for _ in range(10):
        sp.push_audio(quiet)
    sp.process()
    assert sp.has_chunk()
    chunk = sp.get_chunk()
    assert len(chunk) == 10 * F        # 1 loud (entry frame) + 9 quiet


def test_zero_overlap_carries_nothing():
    # :214 `overlap_n > 0 and ...`: overlap disabled must NOT carry the
    # whole chunk (chunk[-0:] is the full array — the classic flip bug)
    cfg = StreamingConfig.custom_latency(2 * F / 16_000, 0.0, 50, 5.0)
    cfg.input_sample_rate = 16_000
    cfg.enable_vad = False
    sp = StreamingProcessor(cfg)
    sp.push_audio(np.full(2 * F, 0.25, np.float32))
    sp.process()
    assert sp.has_chunk()
    assert sp._overlap is None


def test_overlap_equal_to_chunk_length_not_carried():
    # :214 `len(chunk) > overlap_n` strict: a chunk exactly overlap_n long
    # carries nothing (carrying all of it would duplicate audio forever)
    cfg = StreamingConfig.custom_latency(F / 16_000, F / 16_000, 20, 5.0)
    cfg.input_sample_rate = 16_000
    cfg.enable_vad = False
    sp = StreamingProcessor(cfg)
    sp.push_audio(np.full(F, 0.25, np.float32))
    sp.process()
    assert sp.has_chunk()
    assert sp._overlap is None


def test_get_partial_none_when_accumulating_empty():
    # :238/:240 has_partial guards: state ACCUMULATING with zero samples
    # (right after a chunk pop) must report no partial, not crash
    cfg = StreamingConfig.custom_latency(2 * F / 16_000, 0.0, 50, 5.0)
    cfg.input_sample_rate = 16_000
    cfg.enable_vad = False
    sp = StreamingProcessor(cfg)
    sp.push_audio(np.full(2 * F, 0.25, np.float32))
    sp.process()
    sp.get_chunk()
    assert sp.state == ProcessorState.ACCUMULATING_SPEECH  # vad-off: in speech
    assert sp._chunk_samples == 0
    assert sp.get_partial() is None


def test_flush_empty_returns_none_without_phantom_chunk():
    # :258 `chunk_samples > 0` strict: an empty flush emits NOTHING
    sp = StreamingProcessor(_cfg16(enable_vad=False))
    assert sp.flush() is None
    assert not sp.has_chunk()
    assert not any(e.kind == "chunk_ready" for e in sp.events)


def test_flush_resets_chunk_ready_state():
    # :265 `state == CHUNK_READY` -> reset after drain
    sp = StreamingProcessor(_cfg16(enable_vad=False))
    sp.push_audio(np.full(2 * F, 0.25, np.float32))
    out = sp.flush()
    assert out is not None and len(out) == 2 * F
    assert sp.state != ProcessorState.CHUNK_READY
