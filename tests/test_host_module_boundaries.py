"""Mutation killers for round-3e host-module survivors: timestamps.py,
format/v2.py, audio/resample.py, audio/batch.py, utils/memory.py.

The resample tests force the PYTHON path (monkeypatching away the native
fast path) and pin it against the native library — the two are documented
as identical numerics, so the native lib is a free oracle."""

import json
import struct

import numpy as np
import pytest

from whisper_apr_tpu.errors import AudioError, FormatError


# ------------------------------------------------------------ timestamps.py

class _StubTok:
    def decode_with_options(self, tokens, skip_special=True):
        return " ".join(f"t{t}" for t in tokens)


def test_is_timestamp_boundary():
    from whisper_apr_tpu.timestamps import is_timestamp
    assert is_timestamp(1000, timestamp_base=1000) is True
    assert is_timestamp(999, timestamp_base=1000) is False


def test_token_time_value():
    from whisper_apr_tpu.timestamps import token_time
    assert token_time(1050, timestamp_base=1000) == pytest.approx(1.0)


def test_extract_segments_stops_at_eot():
    from whisper_apr_tpu.timestamps import extract_segments
    base, eot = 1000, 999
    toks = [base + 0, 1, 2, base + 50, eot, base + 60, 3, base + 70]
    segs = extract_segments(toks, _StubTok(), timestamp_base=base, eot=eot)
    assert len(segs) == 1                       # nothing after EOT
    assert segs[0].start == 0.0 and segs[0].end == pytest.approx(1.0)
    assert segs[0].tokens == [1, 2]


# ------------------------------------------------------------- format/v2.py

def _v2_writer(quant=0):
    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.format.v2 import AprWriterV2
    return AprWriterV2.from_config(ModelConfig.tiny(), quantization=quant)


def test_v2_float64_input_stored_as_f32():
    from whisper_apr_tpu.format.v2 import AprReaderV2
    w = _v2_writer()
    w.add_tensor("x", np.arange(4, dtype=np.float64))
    r = AprReaderV2(w.to_bytes())
    t = r.load_tensor("x")
    assert t.dtype == np.float32
    assert np.array_equal(t, np.arange(4, dtype=np.float32))


def test_v2_int8_zero_tensor_scale_one():
    from whisper_apr_tpu.format.v2 import QUANT_INT8, AprReaderV2
    w = _v2_writer(QUANT_INT8)
    w.add_tensor("z", np.zeros(4, np.float32))
    r = AprReaderV2(w.to_bytes())
    assert float(r.load_tensor("z.scale")[0]) == 1.0


def test_v2_tensor_offsets_are_aligned():
    from whisper_apr_tpu.format.v2 import AprReaderV2
    w = _v2_writer()
    w.add_tensor("a", np.arange(10, dtype=np.float32))   # 40 B: not 16-mult
    w.add_tensor("b", np.arange(4, dtype=np.float32))
    r = AprReaderV2(w.to_bytes())
    for d in r.tensors:
        assert d.offset % 16 == 0, (d.name, d.offset)
    assert np.array_equal(r.load_tensor("b"),
                          np.arange(4, dtype=np.float32))


def test_v2_magic_with_truncated_header_raises_cleanly():
    from whisper_apr_tpu.format.v2 import MAGIC_V2, AprReaderV2
    with pytest.raises(FormatError, match="APR2"):
        AprReaderV2(MAGIC_V2 + b"\x00")


def test_v2_truncated_metadata_message():
    from whisper_apr_tpu.format.v2 import AprReaderV2
    w = _v2_writer()
    w.add_tensor("x", np.arange(4, dtype=np.float32))
    data = w.to_bytes()
    (meta_len,) = struct.unpack_from("<I", data, 4)
    with pytest.raises(FormatError, match="truncated APR2 metadata"):
        AprReaderV2(data[: 8 + meta_len + 3])


def test_v2_scale_tensors_hidden_from_public_index():
    from whisper_apr_tpu.format.v2 import QUANT_INT8, AprReaderV2
    w = _v2_writer(QUANT_INT8)
    w.add_tensor("w", np.linspace(-1, 1, 8).astype(np.float32))
    w.set_vocabulary(b"V")
    r = AprReaderV2(w.to_bytes())
    assert [d.name for d in r.tensors] == ["w"]
    assert r.header.n_tensors == 1


def test_v2_truncated_tensor_data_bounds():
    from whisper_apr_tpu.format.v2 import AprReaderV2
    w = _v2_writer()
    w.add_tensor("x", np.arange(8, dtype=np.float32))
    data = w.to_bytes()
    # cut into the CRC window: the LAST tensor byte region must be guarded
    with pytest.raises(FormatError, match="out of bounds"):
        AprReaderV2(data[:-5]).load_tensor("x")


# --------------------------------------------------------- audio/resample.py

@pytest.fixture()
def python_path(monkeypatch):
    """Force the pure-Python resampler (mask the native fast path)."""
    import importlib

    import whisper_apr_tpu.native as native
    rs = importlib.import_module("whisper_apr_tpu.audio.resample")
    monkeypatch.setattr(native, "resample_sinc",
                        lambda *a, **k: None)
    return rs


def test_resampler_rejects_zero_kernel():
    from whisper_apr_tpu.audio.resample import SincResampler
    with pytest.raises(AudioError, match="kernel"):
        SincResampler(8000, 16000, kernel_half_len=0)
    SincResampler(8000, 16000, kernel_half_len=1)   # 1 is allowed


def test_python_path_preserves_dc(python_path):
    sr = python_path.SincResampler(8000, 16000)
    out = sr.resample(np.full(800, 0.5, np.float32))
    assert len(out) == 1600
    # interior samples: weight renormalization keeps DC exactly
    assert np.abs(out[100:-100] - 0.5).max() < 1e-6


def test_python_path_upsample_tone(python_path):
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.3, 2000).astype(np.float32)
    py = python_path.SincResampler(44_100, 16_000).resample(audio)
    assert py.shape[0] == int(np.ceil(2000 * 16_000 / 44_100))
    t = np.arange(4000) / 8000.0
    tone = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    out = python_path.SincResampler(8000, 16_000).resample(tone)
    t2 = np.arange(len(out)) / 16_000.0
    ref = np.sin(2 * np.pi * 200 * t2).astype(np.float32)
    assert np.abs(out[200:-200] - ref[200:-200]).max() < 1e-3


def test_python_path_tone_fidelity(python_path):
    # a 200 Hz tone resampled 16k -> 8k must stay a 200 Hz tone
    t = np.arange(4000) / 16_000.0
    tone = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    out = python_path.SincResampler(16_000, 8_000).resample(tone)
    t2 = np.arange(len(out)) / 8_000.0
    ref = np.sin(2 * np.pi * 200 * t2)
    assert np.abs(out[100:-100] - ref[100:-100]).max() < 1e-3


def test_python_path_edge_finiteness(python_path):
    # edge taps are dropped + renormalized: edges stay bounded, no NaN
    out = python_path.SincResampler(22_050, 16_000).resample(
        np.ones(500, np.float32))
    assert np.all(np.isfinite(out))
    assert np.abs(out).max() < 1.01


# ------------------------------------------------------------ audio/batch.py

def test_split_exact_multiple_with_overlap():
    from whisper_apr_tpu.audio.batch import split_into_chunks
    audio = np.arange(180, dtype=np.float32)
    chunks = split_into_chunks(audio, chunk_samples=100, overlap_samples=20)
    # starts 0 and 80; 80+100 == 180 ends the loop EXACTLY (no phantom tail)
    assert len(chunks) == 2
    assert np.array_equal(chunks[0], audio[:100])
    assert np.array_equal(chunks[1], audio[80:180])


# ----------------------------------------------------------- utils/memory.py

def test_memory_plan_total_is_sum():
    from whisper_apr_tpu.utils.memory import MemoryPlan
    p = MemoryPlan(weights_bytes=1, kv_cache_bytes=2, activations_bytes=4)
    assert p.total_bytes == 7


def test_memory_fits_is_strict_at_90pct():
    from whisper_apr_tpu.utils.memory import MemoryPlan
    # total EXACTLY at the 0.9 watermark: does NOT fit (headroom rule)
    watermark = 10 * 0.9
    p = MemoryPlan(weights_bytes=watermark, kv_cache_bytes=0,
                   activations_bytes=0)
    assert p.fits(10) is False
    assert MemoryPlan(8, 0, 0).fits(10) is True
