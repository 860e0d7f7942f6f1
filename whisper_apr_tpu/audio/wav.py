"""RIFF/WAV parsing to mono f32 (reference: src/audio/wav.rs).

Supports PCM 16/24/32-bit and IEEE float32, multi-channel downmix to mono
(reference: src/audio/wav.rs:99 parse_wav, stereo->mono averaging).
Pure host-side code — runs once per file before the TPU pipeline.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

from ..errors import AudioError


def parse_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """Parse WAV bytes -> (mono float32 samples in [-1, 1], sample_rate).

    (reference: src/audio/wav.rs:99)
    """
    if len(data) < 44:
        raise AudioError("WAV file too short")
    if data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioError("not a RIFF/WAVE file")

    # Walk chunks to find fmt and data (some files carry LIST/fact chunks)
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        chunk_id = data[pos:pos + 4]
        (chunk_size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8: pos + 8 + chunk_size]
        if chunk_id == b"fmt ":
            fmt = body
        elif chunk_id == b"data":
            payload = body
        pos += 8 + chunk_size + (chunk_size & 1)  # chunks are word-aligned

    if fmt is None or len(fmt) < 16:
        raise AudioError("missing fmt chunk")
    if payload is None:
        raise AudioError("missing data chunk")

    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = \
        struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: actual format in the GUID's first 2 bytes
        (audio_format,) = struct.unpack_from("<H", fmt, 24)
    if n_channels == 0:
        raise AudioError("zero channels")

    if audio_format == 1:  # PCM
        if bits == 16:
            samples = np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            n = len(raw) // 3
            raw = raw[: n * 3].reshape(n, 3)
            vals = (raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16))
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            samples = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            samples = np.frombuffer(payload, dtype="<i4").astype(np.float32) / float(1 << 31)
        elif bits == 8:
            samples = (np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise AudioError(f"unsupported PCM bit depth: {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            samples = np.frombuffer(payload, dtype="<f4").astype(np.float32)
        elif bits == 64:
            samples = np.frombuffer(payload, dtype="<f8").astype(np.float32)
        else:
            raise AudioError(f"unsupported float bit depth: {bits}")
    else:
        raise AudioError(f"unsupported WAV format code: {audio_format}")

    if n_channels > 1:
        n = len(samples) // n_channels
        samples = samples[: n * n_channels].reshape(n, n_channels).mean(axis=1)

    return np.ascontiguousarray(samples, dtype=np.float32), int(sample_rate)


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 16_000) -> None:
    """Write mono f32 samples as PCM16 WAV (test/tooling helper)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float32), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2").tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm16), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(pcm16))
    with open(path, "wb") as f:
        f.write(header + pcm16)
