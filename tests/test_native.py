"""Native C++ runtime kernel tests (ctypes bindings vs Python fallbacks)."""

import numpy as np
import pytest

from whisper_apr_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("no C++ toolchain / build failed")
    return True


class TestNative:
    def test_crc32_matches_zlib(self, lib_available):
        import zlib
        for data in (b"", b"Hello, World!", bytes(range(256)) * 100):
            assert native.crc32(data) == zlib.crc32(data) & 0xFFFFFFFF
        # reference pinned value (checksum.rs doc-test)
        assert native.crc32(b"Hello, World!") == 0xEC4AC3D0

    def test_resample_matches_python(self, lib_available):
        from whisper_apr_tpu.audio.resample import SincResampler
        rng = np.random.default_rng(0)
        x = rng.normal(0, 0.3, 4410).astype(np.float32)
        out_native = native.resample_sinc(x, 44_100, 16_000)
        # force the Python path by computing the vectorized version directly
        r = SincResampler(44_100, 16_000)
        import whisper_apr_tpu.native as n

        class _Off:
            def __enter__(self):
                self._lib = n._lib
                self._failed = n._build_failed
                n._lib, n._build_failed = None, True

            def __exit__(self, *a):
                n._lib, n._build_failed = self._lib, self._failed

        with _Off():
            out_py = r.resample(x)
        assert len(out_native) == len(out_py)
        assert np.abs(out_native - out_py).max() < 1e-5

    def test_pcm16_stereo_downmix(self, lib_available):
        pcm = np.array([16384, -16384, 0, 32767], dtype=np.int16)
        out = native.pcm16_to_f32_mono(pcm, 2)
        assert len(out) == 2
        assert abs(out[0]) < 1e-6  # L+R cancel

    def test_frame_energy_zcr(self, lib_available):
        from whisper_apr_tpu.vad import frame_energy, zero_crossing_rate
        rng = np.random.default_rng(1)
        x = rng.normal(0, 0.2, 4800).astype(np.float32)
        energy, zcr = native.frame_energy_zcr(x, 480)
        for f in range(10):
            fr = x[f * 480:(f + 1) * 480]
            assert energy[f] == pytest.approx(frame_energy(fr), abs=1e-5)
            assert zcr[f] == pytest.approx(zero_crossing_rate(fr), abs=1e-5)

    def test_resampler_uses_native_transparently(self, lib_available):
        # the public resampler path must produce identical results whether
        # or not the native lib is used (covered above); here just smoke it
        from whisper_apr_tpu.audio.resample import SincResampler
        y = SincResampler(48_000, 16_000).resample(
            np.ones(4800, np.float32))
        assert len(y) == 1600


class TestNativeLz4:
    def test_matches_python_decoder(self):
        """C++ block decoder vs the Python reference on round-trips."""
        from whisper_apr_tpu import native
        from whisper_apr_tpu.format.compress import compress_block
        if not native.available():
            pytest.skip("no native library")
        rng = np.random.default_rng(0)
        for data in (b"", b"abc", b"ab" * 4000,
                     rng.integers(0, 8, 5000).astype(np.uint8).tobytes(),
                     rng.integers(0, 256, 3000).astype(np.uint8).tobytes()):
            comp = compress_block(data)
            out = native.lz4_decompress_block(comp, max(len(data), 1))
            assert out == data, (len(data), len(out or b""))

    def test_malformed_returns_none(self):
        from whisper_apr_tpu import native
        if not native.available():
            pytest.skip("no native library")
        # match offset pointing before the start of output
        import struct
        bad = bytes([0x14]) + b"a" + struct.pack("<H", 9) + b"\0\0"
        assert native.lz4_decompress_block(bad, 64) is None

    def test_python_decoder_used_when_native_rejects(self):
        """decompress_block still raises exact FormatErrors via the
        Python fallback when input is malformed."""
        from whisper_apr_tpu.errors import FormatError
        from whisper_apr_tpu.format.compress import decompress_block
        with pytest.raises(FormatError):
            decompress_block(b"\xff\xff\xff", 10)
