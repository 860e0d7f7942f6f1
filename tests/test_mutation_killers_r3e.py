"""Killer tests for mutation survivors in vad.py, detection.py,
audio/streaming.py, and format/container.py (MUTATION.json round-3e).

Each test pins the exact boundary/arithmetic a surviving mutant flipped;
dyadic-rational magnitudes (powers of two) make energy comparisons exact
in float64 so strict-vs-nonstrict inequality flips are observable.
"""

import struct

import numpy as np
import pytest

from whisper_apr_tpu.errors import FormatError
from whisper_apr_tpu.format import container as fc
from whisper_apr_tpu.format.checksum import crc32
from whisper_apr_tpu.vad import (SilenceConfig, SilenceDetector, StreamingVad,
                                 VadConfig, VoiceActivityDetector,
                                 frame_energy, zero_crossing_rate)


# ---------------------------------------------------------------- vad.py

def test_zcr_two_sample_frame():
    # size < 2 guard is strict: exactly 2 samples must compute a real ZCR
    assert zero_crossing_rate(np.array([-1.0, 1.0])) == 1.0
    assert zero_crossing_rate(np.array([1.0])) == 0.0


def test_energy_gate_is_strict():
    # e == noise_floor * energy_threshold exactly (dyadic): NOT active
    vad = VoiceActivityDetector(VadConfig(min_speech_frames=1))
    vad.noise_floor = 2.0 ** -13
    frame = np.full(480, 2.0 ** -12, np.float32)  # e == floor * 2.0 exactly
    assert frame_energy(frame) == vad.noise_floor * vad.config.energy_threshold
    assert vad.process_frame(frame) is False
    assert vad._speech_run == 0


def test_fricative_zcr_gate_is_strict():
    # z == zcr_threshold exactly with energy in (1.5*floor, 2*floor): inactive
    vad = VoiceActivityDetector(VadConfig(min_speech_frames=1,
                                          zcr_threshold=1.0))
    vad.noise_floor = 2.0 ** -13
    v = 7 * 2.0 ** -15  # 1.5*floor < e < 2*floor
    frame = (v * np.where(np.arange(480) % 2 == 0, 1.0, -1.0)).astype(np.float32)
    assert zero_crossing_rate(frame) == 1.0
    assert vad.process_frame(frame) is False


def test_fricative_energy_gate_is_strict():
    # e == 1.5 * floor exactly with z above threshold: inactive
    vad = VoiceActivityDetector(VadConfig(min_speech_frames=1))
    vad.noise_floor = 2.0 ** -13
    v = 3 * 2.0 ** -14  # == 1.5 * floor
    frame = (v * np.where(np.arange(480) % 2 == 0, 1.0, -1.0)).astype(np.float32)
    assert frame_energy(frame) == vad.noise_floor * 1.5
    assert zero_crossing_rate(frame) > vad.config.zcr_threshold
    assert vad.process_frame(frame) is False


def test_noise_floor_adaptation_value():
    # floor' = s*floor + (1-s)*e exactly (not (1+s)*e)
    vad = VoiceActivityDetector(VadConfig())
    vad.noise_floor = 2.0 ** -10
    e = 2.0 ** -14
    vad.process_frame(np.full(480, e, np.float32))  # inactive -> adapts
    expected = 0.95 * 2.0 ** -10 + 0.05 * e
    assert abs(vad.noise_floor - expected) < 1e-12


def test_speech_entry_needs_min_frames_exactly():
    vad = VoiceActivityDetector(VadConfig(min_speech_frames=3))
    loud = np.full(480, 0.5, np.float32)
    assert vad.process_frame(loud) is False   # 1st active frame: not yet
    assert vad.process_frame(loud) is False   # 2nd: not yet
    assert vad.process_frame(loud) is True    # exactly min_speech_frames


def test_detect_backdates_start_exactly():
    cfg = VadConfig(min_speech_frames=3, min_silence_frames=2)
    fs = cfg.frame_size
    audio = np.concatenate([np.zeros(5 * fs, np.float32),
                            np.full(5 * fs, 0.5, np.float32)])
    segs = VoiceActivityDetector(cfg).detect(audio)
    # speech_run hits 3 at frame index 7 -> backdated start (7-3+1)*fs = 5*fs
    assert segs == [(5 * fs, 10 * fs)]


def test_silence_segment_duration():
    from whisper_apr_tpu.vad import SilenceSegment
    assert SilenceSegment(1.0, 2.5, 0.0).duration() == 1.5


def test_silence_update_noise_floor_value():
    d = SilenceDetector()
    d.noise_floor = 0.5
    d._update_noise_floor(0.1)
    assert abs(d.noise_floor - (0.95 * 0.5 + 0.05 * 0.1)) < 1e-12


def test_silence_threshold_is_strict():
    # e == threshold exactly (non-adaptive): NOT silence
    d = SilenceDetector(SilenceConfig(adaptive=False, silence_threshold=0.25))
    d.process_frame(np.full(4000, 0.25, np.float32))
    assert d._silence_start is None


def test_min_silence_duration_boundary():
    # a silence span of EXACTLY min_silence_duration is reported
    d = SilenceDetector(SilenceConfig(adaptive=False, silence_threshold=0.5,
                                      min_silence_duration=0.5))
    loud = np.full(8000, 1.0, np.float32)
    quiet = np.zeros(8000, np.float32)
    assert d.process_frame(loud) is None          # t 0.0-0.5
    assert d.process_frame(quiet) is None         # silence starts at 0.5
    seg = d.process_frame(loud)                   # ends at 1.0: duration 0.5
    assert seg is not None and (seg.start, seg.end) == (0.5, 1.0)


def test_max_silence_fires_at_exact_boundary():
    d = SilenceDetector(SilenceConfig(adaptive=False, silence_threshold=0.5,
                                      min_silence_duration=0.0,
                                      max_silence_duration=0.75))
    loud = np.full(4000, 1.0, np.float32)
    quiet = np.zeros(4000, np.float32)
    assert d.process_frame(loud) is None          # t 0.00-0.25
    assert d.process_frame(quiet) is None         # start = 0.25
    assert d.process_frame(quiet) is None         # now 0.50: 0.25 < 0.75
    assert d.process_frame(quiet) is None         # now 0.75: 0.50 < 0.75
    seg = d.process_frame(quiet)                  # now 1.00: 0.75 >= 0.75
    assert seg is not None and (seg.start, seg.end) == (0.25, 1.0)


def test_streaming_vad_filter_passthrough_and_bounds():
    cfg = VadConfig(frame_size=160, min_speech_frames=2)
    sv = StreamingVad(cfg)
    fs = 160
    audio = np.full(6 * fs, 0.5, np.float32)
    out = sv.filter(audio)
    # warm-up frame zeroed; once in speech, frames pass through VERBATIM
    assert np.all(out[:fs] == 0.0)
    assert np.array_equal(out[fs:], audio[fs:])   # incl. the LAST frame
    # no phantom extra (empty) frame processed past the end
    assert sv.vad._silence_run == 0


# ----------------------------------------------------------- detection.py

def test_language_probs_truncated_logits():
    from whisper_apr_tpu import detection
    from whisper_apr_tpu.tokenizer import special_tokens as st
    logits = np.zeros(st.LANG_BASE + 5, np.float32)
    probs = detection.LanguageProbs.from_logits(logits)
    assert len(probs.probs) == 5


def test_language_probs_softmax_is_shift_stable():
    # huge logits: only the subtract-max form stays finite
    from whisper_apr_tpu import detection
    from whisper_apr_tpu.tokenizer import special_tokens as st
    logits = np.zeros(st.LANG_BASE + len(st.LANGUAGES), np.float32)
    logits[st.LANG_BASE:] = 800.0
    logits[st.LANG_BASE + 1] = 801.0  # 'zh' wins
    probs = detection.LanguageProbs.from_logits(logits)
    vals = np.array(list(probs.probs.values()))
    assert np.all(np.isfinite(vals)) and abs(vals.sum() - 1.0) < 1e-9
    assert probs.best[0] == "zh"


def test_detector_min_confidence_is_strict():
    # p == min_confidence exactly: the detected language IS returned
    from whisper_apr_tpu import detection
    from whisper_apr_tpu.tokenizer import special_tokens as st
    logits = np.zeros(st.LANG_BASE + len(st.LANGUAGES), np.float32)
    logits[st.LANG_BASE + 1] = 3.0  # 'zh'
    p = detection.LanguageProbs.from_logits(logits).best[1]
    lang, conf, _ = detection.LanguageDetector(min_confidence=p).detect(logits)
    assert lang == "zh" and conf == p


# ----------------------------------------------------- audio/streaming.py

def test_get_chunk_keeps_ready_state_while_queue_nonempty():
    from whisper_apr_tpu.audio.streaming import (ProcessorState,
                                                 StreamingProcessor)
    sp = StreamingProcessor()
    sp._ready_chunks = [np.zeros(10, np.float32), np.ones(10, np.float32)]
    sp.state = ProcessorState.CHUNK_READY
    sp._in_speech = False
    first = sp.get_chunk()
    assert np.all(first == 0.0)
    assert sp.state == ProcessorState.CHUNK_READY        # one chunk left
    sp.get_chunk()
    assert sp.state == ProcessorState.WAITING_FOR_SPEECH  # queue drained


# ----------------------------------------------------- format/container.py

def test_kquant_dispatch_per_code():
    # each code must route to ITS codec: block sizes 144/176/210 differ
    rng = np.random.default_rng(0)
    flat = rng.standard_normal((1, 512)).astype(np.float32)
    for code, bb in fc._KQUANT_BLOCK_BYTES.items():
        raw = fc._kquant_quantize(code, flat)
        assert raw.shape[-2:] == (2, bb), (code, raw.shape)
        deq = fc._kquant_dequantize(code, raw)
        err = np.abs(deq.astype(np.float64) - flat).max()
        assert err < 0.5, (code, err)


def test_tensor_descriptor_exact_size_and_nul_name():
    # exactly 96 bytes parses; all-NUL name decodes to ""
    data = bytes(fc.TENSOR_INDEX_ENTRY_SIZE)
    desc = fc.TensorDescriptor.parse(data)
    assert desc.name == ""
    with pytest.raises(FormatError):
        fc.TensorDescriptor.parse(data[:-1])


def test_filterbank_exact_sizes():
    # 8-byte empty filterbank parses; exact-length roundtrip parses
    fb = fc.MelFilterbankData.from_bytes(struct.pack("<II", 0, 0))
    assert fb.data.shape == (0, 0)
    orig = fc.MelFilterbankData(2, 3, np.arange(6, dtype=np.float32).reshape(2, 3))
    back = fc.MelFilterbankData.from_bytes(orig.to_bytes())
    assert np.array_equal(back.data, orig.data)


def test_magic_only_file_reports_header_too_short():
    with pytest.raises(FormatError, match="header"):
        fc.AprReader(fc.MAGIC)


def _tiny_header(**kw):
    cfg_kw = dict(n_tensors=0)
    cfg_kw.update(kw)
    return fc.AprHeader(**cfg_kw)


def test_index_exact_length_file_parses():
    # a file ending exactly after the index is NOT "too short"
    h = _tiny_header(n_tensors=1)
    desc = fc.TensorDescriptor("t", 0, 0, 0, (0, 0, 0, 0), 1)
    data = fc.MAGIC + h.to_bytes() + desc.to_bytes()
    r = fc.AprReader(data)
    assert r.tensor_names() == ["t"]


def test_index_truncated_raises_index_error_message():
    h = _tiny_header(n_tensors=1)
    desc = fc.TensorDescriptor("t", 0, 0, 0, (0, 0, 0, 0), 1)
    data = fc.MAGIC + h.to_bytes() + desc.to_bytes()[:-1]
    with pytest.raises(FormatError, match="tensor index"):
        fc.AprReader(data)


def test_uncompressed_file_has_no_payload():
    w = fc.AprWriter(fc.AprHeader())
    w.add_tensor("x", np.arange(4, dtype=np.float32))
    r = fc.AprReader(w.to_bytes())
    assert r._payload is None
    assert np.array_equal(r.load_raw("x"), np.arange(4, dtype=np.float32))


def test_compressed_zero_length_payload_parses():
    # file ending exactly after a comp_len==0 field: payload is b""
    h = _tiny_header(n_tensors=1, compressed=True)
    desc = fc.TensorDescriptor("t", 0, 0, 0, (0, 0, 0, 0), 1)
    data = (fc.MAGIC + h.to_bytes() + desc.to_bytes()
            + struct.pack("<I", 0))
    r = fc.AprReader(data)
    assert r._payload == b""


def test_compressed_payload_exact_end_parses():
    # compressed file truncated right at payload end (no CRC) still loads
    h = fc.AprHeader(compressed=True)
    w = fc.AprWriter(h)
    vals = np.arange(8, dtype=np.float32)
    w.add_tensor("x", vals)
    full = w.to_bytes()
    # strip trailing CRC (4 bytes): payload now ends exactly at file end
    r = fc.AprReader(full[:-4])
    assert np.array_equal(r.load_tensor("x"), vals)


def test_legacy_block_framing_still_reads():
    # non-LZ4-frame payloads route to the legacy block decompressor
    from whisper_apr_tpu.format.compress import compress_blocks
    h = _tiny_header(n_tensors=1, compressed=True)
    vals = np.arange(16, dtype=np.float32)
    payload = vals.tobytes()
    desc = fc.TensorDescriptor("x", 0, len(payload), vals.size,
                               (16, 0, 0, 0), 1)
    comp = compress_blocks(payload)
    assert struct.unpack_from("<I", comp)[0] != fc.LZ4_MAGIC if hasattr(fc, "LZ4_MAGIC") else True
    data = (fc.MAGIC + h.to_bytes() + desc.to_bytes()
            + struct.pack("<I", len(comp)) + comp)
    r = fc.AprReader(data)
    assert np.array_equal(r.load_raw("x"), vals)


def test_int8_scale_table_second_tensor():
    w = fc.AprWriter(fc.AprHeader(quantization=fc.QUANT_INT8))
    w.add_tensor("a", np.array([1.0, -1.0], np.float32))     # scale 1/127
    w.add_tensor("b", np.array([254.0, -254.0], np.float32))  # scale 2
    r = fc.AprReader(w.to_bytes())
    assert abs(r.scale_for("a") - 1.0 / 127.0) < 1e-7
    assert abs(r.scale_for("b") - 2.0) < 1e-6
    assert np.allclose(r.load_tensor("b"), [254.0, -254.0])


def test_int8_truncated_tensor_raises_format_error():
    w = fc.AprWriter(fc.AprHeader(quantization=fc.QUANT_INT8))
    w.add_tensor("a", np.ones(64, np.float32))
    full = w.to_bytes()
    # cut into the tensor data (keep header/index/scales intact)
    r = fc.AprReader(full[:fc.AprReader(full).tensor_data_offset + 8])
    with pytest.raises(FormatError, match="out of bounds"):
        r.load_raw("a")


def test_q4k_file_small_tensors_stay_f32():
    w = fc.AprWriter(fc.AprHeader(quantization=fc.QUANT_Q4K))
    big = np.random.default_rng(1).standard_normal((64, 64)).astype(np.float32)
    bias = np.arange(7, dtype=np.float32)
    w.add_tensor("w", big)
    w.add_tensor("bias", bias)
    r = fc.AprReader(w.to_bytes())
    assert np.array_equal(r.load_tensor("bias"), bias)  # exact: stored f32
    assert np.abs(r.load_tensor("w") - big).max() < 0.5  # quantized


def _file_with_sections(vocab=b"VOCAB!", fb=True):
    w = fc.AprWriter(fc.AprHeader())
    w.add_tensor("x", np.arange(4, dtype=np.float32))
    if vocab is not None:
        w.set_vocabulary(vocab)
    if fb:
        w.set_mel_filterbank(
            fc.MelFilterbankData(2, 3, np.arange(6, dtype=np.float32).reshape(2, 3)))
    return w.to_bytes()


def test_sections_roundtrip_offsets():
    data = _file_with_sections()
    r = fc.AprReader(data)
    assert r.read_vocabulary_bytes() == b"VOCAB!"
    fb = r.read_mel_filterbank()
    assert fb is not None and np.array_equal(
        fb.data, np.arange(6, dtype=np.float32).reshape(2, 3))


def test_empty_vocab_at_exact_file_end():
    # has_vocab with size 0 and the file ending right there: returns b""
    data = _file_with_sections(vocab=b"", fb=False)
    r0 = fc.AprReader(data)
    start = r0._section_after_tensors()
    truncated = data[:start + 4]  # drop CRC: ends exactly after size field
    assert fc.AprReader(truncated).read_vocabulary_bytes() == b""


def test_truncated_sections_return_none():
    data = _file_with_sections()
    r0 = fc.AprReader(data)
    start = r0._section_after_tensors()
    # vocab size field cut mid-way
    assert fc.AprReader(data[:start + 3]).read_vocabulary_bytes() is None
    # vocab payload cut mid-way
    assert fc.AprReader(data[:start + 4 + 2]).read_vocabulary_bytes() is None
    # filterbank: vocab intact, fb size field cut
    fb_start = start + 4 + len(b"VOCAB!")
    assert fc.AprReader(data[:fb_start + 3]).read_mel_filterbank() is None
    # fb payload cut
    assert fc.AprReader(data[:fb_start + 4 + 5]).read_mel_filterbank() is None


def test_empty_filterbank_section_at_exact_end():
    # has_filterbank, size field == 8 (empty 0x0 fb), file ends exactly there
    w = fc.AprWriter(fc.AprHeader())
    w.add_tensor("x", np.arange(4, dtype=np.float32))
    w.set_mel_filterbank(fc.MelFilterbankData(0, 0, np.zeros((0, 0), np.float32)))
    data = w.to_bytes()[:-4]  # strip CRC: fb section is the last bytes
    fb = fc.AprReader(data).read_mel_filterbank()
    assert fb is not None and fb.n_mels == 0


def test_add_tensor_accepts_4d_rejects_5d():
    w = fc.AprWriter(fc.AprHeader())
    w.add_tensor("ok4", np.zeros((2, 2, 2, 2), np.float32))
    with pytest.raises(FormatError, match="rank"):
        w.add_tensor("bad5", np.zeros((1, 1, 1, 1, 1), np.float32))


def test_writer_crc_roundtrip():
    data = _file_with_sections()
    assert fc.AprReader(data).verify_crc()
    corrupt = data[:-4] + struct.pack("<I", struct.unpack_from(
        "<I", data, len(data) - 4)[0] ^ 1)
    assert not fc.AprReader(corrupt).verify_crc()
