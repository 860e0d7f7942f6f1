"""Audio front-end tests.

Golden-trace gates mirror the reference harness
(reference: test_data/reference_summary.md — cosine > 0.99 mel gate;
examples/compare_mel_hf.rs stage comparisons).
"""

import io
import struct

import numpy as np
import pytest

from whisper_apr_tpu.audio import (
    HOP_LENGTH,
    N_FFT,
    SincResampler,
    parse_wav,
)
from whisper_apr_tpu.audio.mel import (
    MelFilterbank,
    hann_window,
    mel_filterbank,
)
from whisper_apr_tpu.audio.wav import write_wav
from whisper_apr_tpu.errors import AudioError


class TestFilterbank:
    def test_matches_reference_mel80(self, golden_filterbank):
        """Slaney filterbank must bit-match OpenAI's (float32 rounding only)."""
        mine = mel_filterbank(80)
        assert mine.shape == (80, 201)
        assert np.abs(mine - golden_filterbank).max() < 1e-7
        assert (mine != 0).sum() == (golden_filterbank != 0).sum()

    def test_matches_reference_mel128(self):
        import os
        path = "/root/reference/data/mel_128.bin"
        if not os.path.exists(path):
            pytest.skip("no reference mel_128")
        ref = np.fromfile(path, dtype=np.float32).reshape(128, 201)
        assert np.abs(mel_filterbank(128) - ref).max() < 1e-7

    def test_rows_nonnegative_and_normalized(self):
        fb = mel_filterbank(80)
        assert (fb >= 0).all()
        # slaney norm: rows integrate to ~2/bandwidth, peak well below 1
        assert fb.max() < 0.05

    def test_hann_window(self):
        w = hann_window(400)
        assert w[0] == 0.0
        assert abs(w[200] - 1.0) < 1e-6  # periodic window peaks at N/2


class TestMel:
    def test_golden_mel(self, golden_audio, golden_filterbank, golden_mel):
        """1.5 s clip must reproduce the whisper.cpp golden mel
        (reference gate: cosine > 0.99, reference_summary.md)."""
        mel = MelFilterbank(golden_filterbank).compute(golden_audio)
        assert mel.shape == (148, 80)
        cos = float(mel.ravel() @ golden_mel.ravel()
                    / (np.linalg.norm(mel) * np.linalg.norm(golden_mel)))
        assert cos > 0.9999
        assert np.abs(mel - golden_mel).max() < 0.05

    def test_computed_filterbank_matches_golden_too(self, golden_audio, golden_mel):
        mel = MelFilterbank.create(80).compute(golden_audio)
        cos = float(mel.ravel() @ golden_mel.ravel()
                    / (np.linalg.norm(mel) * np.linalg.norm(golden_mel)))
        assert cos > 0.9999

    def test_30s_shape_and_padding(self, golden_audio, golden_filterbank):
        m = MelFilterbank(golden_filterbank).compute_30s(golden_audio)
        assert m.shape == (3000, 80)
        # silent tail frames are padded with -1.0 (reference: src/lib.rs:434)
        assert (m[-1] == -1.0).all()

    def test_frame_count_formula(self, golden_filterbank):
        fb = MelFilterbank(golden_filterbank)
        for n in (400, 560, 24_000):
            mel = fb.compute(np.zeros(n, np.float32))
            assert mel.shape[0] == (n - N_FFT) // HOP_LENGTH + 1

    def test_short_audio_empty(self, golden_filterbank):
        fb = MelFilterbank(golden_filterbank)
        assert fb.compute(np.zeros(100, np.float32)).shape == (0, 80)

    def test_normalization_range(self, golden_audio, golden_filterbank):
        # after max-8 clamp and (x+4)/4, span is at most 2.0
        mel = MelFilterbank(golden_filterbank).compute(golden_audio)
        assert mel.max() - mel.min() <= 2.0 + 1e-5

    def test_silence(self, golden_filterbank):
        mel = MelFilterbank(golden_filterbank).compute(np.zeros(16_000, np.float32))
        # all bins hit the 1e-10 floor -> log10 = -10 -> constant output
        assert np.allclose(mel, mel[0, 0])


class TestResampler:
    def test_identity(self):
        r = SincResampler(16_000, 16_000)
        x = np.sin(np.arange(1600) * 0.01).astype(np.float32)
        assert np.array_equal(r.resample(x), x)

    def test_downsample_length(self):
        # reference doc-test: 48k->16k of 4800 samples gives ~1600
        r = SincResampler(48_000, 16_000)
        x = np.sin(np.arange(4800) * 0.01).astype(np.float32)
        y = r.resample(x)
        assert 1590 <= len(y) <= 1610

    def test_tone_preserved(self):
        # 440 Hz tone must survive 44.1k -> 16k with correct frequency
        sr_in, sr_out, f0 = 44_100, 16_000, 440.0
        t_in = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f0 * t_in).astype(np.float32)
        y = SincResampler(sr_in, sr_out).resample(x)
        # dominant DFT bin of the middle section
        mid = y[2000:10000].astype(np.float64)
        spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
        peak_hz = np.argmax(spec) * sr_out / len(mid)
        assert abs(peak_hz - f0) < 5.0
        # amplitude roughly preserved
        assert 0.9 < np.abs(mid).max() < 1.1

    def test_upsample(self):
        y = SincResampler(8_000, 16_000).resample(np.ones(800, np.float32))
        assert len(y) == 1600
        # DC preserved by weight renormalization
        assert np.abs(y[100:-100] - 1.0).max() < 1e-3

    def test_empty_raises(self):
        with pytest.raises(AudioError):
            SincResampler(44_100, 16_000).resample(np.array([], np.float32))

    def test_zero_rate_raises(self):
        with pytest.raises(AudioError):
            SincResampler(0, 16_000)


class TestWav:
    def test_pcm16_roundtrip(self, tmp_path):
        x = (np.sin(np.arange(1600) * 0.02) * 0.5).astype(np.float32)
        path = str(tmp_path / "t.wav")
        write_wav(path, x, 16_000)
        samples, sr = parse_wav(open(path, "rb").read())
        assert sr == 16_000
        assert len(samples) == 1600
        assert np.abs(samples - x).max() < 1e-3

    def test_stereo_downmix(self):
        # hand-build a stereo PCM16 file: L=0.5, R=-0.5 -> mono 0
        n = 100
        left = np.full(n, 0.5)
        right = np.full(n, -0.5)
        inter = np.empty(2 * n, np.float32)
        inter[0::2], inter[1::2] = left, right
        pcm = (inter * 32767).astype("<i2").tobytes()
        hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE",
                          b"fmt ", 16, 1, 2, 16_000, 64_000, 4, 16, b"data", len(pcm))
        samples, sr = parse_wav(hdr + pcm)
        assert len(samples) == n
        assert np.abs(samples).max() < 1e-3

    def test_float32_wav(self):
        x = np.linspace(-1, 1, 64).astype("<f4")
        pcm = x.tobytes()
        hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE",
                          b"fmt ", 16, 3, 1, 16_000, 64_000, 4, 32, b"data", len(pcm))
        samples, _ = parse_wav(hdr + pcm)
        assert np.abs(samples - x).max() < 1e-7

    def test_not_riff(self):
        with pytest.raises(AudioError):
            parse_wav(b"\x00" * 100)

    def test_truncated(self):
        with pytest.raises(AudioError):
            parse_wav(b"RIFF\x00\x00\x00\x00WAVE")
