"""Round-3e final mutation killers: resample python-vs-native parity
(edge-tap handling), benchmark emitter/timing guards, APR2 exact-length
boundaries."""

import json
import struct

import numpy as np
import pytest

from whisper_apr_tpu.errors import FormatError


def test_resample_python_matches_native_edges(monkeypatch):
    """The pure-Python path is documented as identical numerics to the
    C++ fast path — including EDGE handling (dropped out-of-range taps +
    renormalization), which a DC signal cannot distinguish. A ramp can."""
    import importlib

    from whisper_apr_tpu.native import resample_sinc
    rs = importlib.import_module("whisper_apr_tpu.audio.resample")
    audio = (np.linspace(-1, 1, 1000)
             + 0.1 * np.sin(np.arange(1000))).astype(np.float32)
    native_out = resample_sinc(audio, 22_050, 16_000, 16, 6.0)
    if native_out is None:
        pytest.skip("native library unavailable")
    import whisper_apr_tpu.native as native_mod
    monkeypatch.setattr(native_mod, "resample_sinc", lambda *a, **k: None)
    py_out = rs.SincResampler(22_050, 16_000).resample(audio)
    assert py_out.shape == native_out.shape
    assert np.abs(py_out - native_out).max() < 1e-5


def test_benchmark_components_nonnegative_and_csv_emit():
    from whisper_apr_tpu.utils.benchmark import run_pipeline_benchmark
    out = run_pipeline_benchmark(audio_seconds=1.0, decode_tokens=3,
                                 emit="json")
    d = json.loads(out)
    assert all(c["seconds"] >= 0.0 for c in d["components"])
    assert sum(c["fraction"] for c in d["components"]) == pytest.approx(
        1.0, abs=0.05)
    csv = run_pipeline_benchmark(audio_seconds=1.0, decode_tokens=3,
                                 emit="csv")
    assert csv.splitlines()[0] == "component,seconds,fraction"


def test_v2_twelve_byte_file_reports_bad_metadata():
    # len == 12 exactly passes the size gate and fails in the JSON parse
    from whisper_apr_tpu.format.v2 import MAGIC_V2, AprReaderV2
    data = MAGIC_V2 + struct.pack("<I", 0) + b"\x00\x00\x00\x00"
    with pytest.raises(FormatError, match="bad APR2 metadata"):
        AprReaderV2(data)


def test_v2_metadata_exact_end_constructs():
    # a file ending exactly at meta_end+4 parses its metadata fine
    from whisper_apr_tpu.config import ModelConfig
    from whisper_apr_tpu.format.v2 import AprReaderV2, AprWriterV2
    w = AprWriterV2.from_config(ModelConfig.tiny())
    w.add_tensor("x", np.arange(4, dtype=np.float32))
    data = w.to_bytes()
    (meta_len,) = struct.unpack_from("<I", data, 4)
    r = AprReaderV2(data[: 8 + meta_len + 4])
    assert [d.name for d in r.tensors] == ["x"]
